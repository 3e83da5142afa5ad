package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join by key salting (SURVEY.md §4: the reference has
  * no skew handling; at 10^12-turn scale one hot entity would pin a single
  * reducer).
  *
  * The skewed (fact) side gets a random-but-deterministic salt in
  * [0, buckets); the dimension side is exploded `buckets` times so every
  * salted key finds its match. Use when AQE's runtime skew split is not
  * available (e.g. a non-AQE-eligible join) or the skew is known up front;
  * otherwise prefer AQE (enabled in all session builders here).
  */
object SaltedJoin {

  private val SupportedTypes = Set("inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "left_anti", "leftanti")

  /** Equi-join `fact` with `dim` on `key`, spreading each fact key over
    * `buckets` partitions. Deterministic: the salt is a hash of the whole
    * fact row's monotonic id substitute (its other columns), not a random. */
  def join(fact: DataFrame, dim: DataFrame, key: String, buckets: Int,
           joinType: String = "inner"): DataFrame = {
    // right/full outer would emit `buckets` copies of every unmatched dim
    // row (the dim side is exploded) — reject instead of silently corrupting
    require(SupportedTypes.contains(joinType.toLowerCase),
      s"salted join supports fact-preserving types only, got $joinType")
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col): _*), lit(buckets)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(explodedDim, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
