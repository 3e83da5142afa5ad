package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join by key salting (SURVEY.md §4: the reference has
  * no skew handling; at 10^12-turn scale one hot entity would pin a single
  * reducer).
  *
  * The skewed (fact) side gets a position-derived salt in [0, buckets)
  * (see [[SaltedJoin.join]] — salts vary run to run, the join RESULT does
  * not); the dimension side is exploded `buckets` times so every salted
  * key finds its match. Use when AQE's runtime skew split is not
  * available (e.g. a non-AQE-eligible join) or the skew is known up front;
  * otherwise prefer AQE (enabled in all session builders here).
  */
object SaltedJoin {

  private val SupportedTypes = Set("inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "left_anti", "leftanti")

  /** Equi-join `fact` with `dim` on `key`, spreading each fact key over
    * `buckets` partitions. The salt derives from each row's physical
    * position (monotonically_increasing_id), NOT from a hash of the row's
    * content: identical duplicate rows of the hot key would content-hash to
    * ONE salt bucket and re-concentrate exactly the skew being split. The
    * join RESULT is salt-independent (the salt is an internal join column,
    * dropped after), so the position-derived value does not affect output
    * determinism. */
  def join(fact: DataFrame, dim: DataFrame, key: String, buckets: Int,
           joinType: String = "inner"): DataFrame = {
    // right/full outer would emit `buckets` copies of every unmatched dim
    // row (the dim side is exploded) — reject instead of silently corrupting
    require(SupportedTypes.contains(joinType.toLowerCase),
      s"salted join supports fact-preserving types only, got $joinType")
    val saltedFact = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)).cast("int"))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(explodedDim, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
