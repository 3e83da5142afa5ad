package graft.materialize

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-predicate profile of a published edge table — the operational
  * schema-statistics view behind `KgMain stats` (and the query-registry
  * analogue `kg_schema_profile`): cardinalities, max out-degree, an
  * is-functional flag and total support weight. A functional predicate
  * whose max out-degree grows past 1 between runs means extraction rules
  * regressed upstream.
  *
  * Shape at scale: one pass of two map-side-combinable aggregations over
  * the edge table; the per-predicate rollups are ontology-sized. No
  * collect — callers print or join the returned frame.
  */
object GraphStats {

  /** @param edges frame with (subj, pred, obj) and optional weight column */
  def profile(edges: DataFrame): DataFrame = {
    val hasWeight = edges.columns.contains("weight")
    val wCol = if (hasWeight) col("weight") else lit(1L)
    val card = edges.groupBy("pred").agg(
      count(lit(1)).as("n_edges"),
      countDistinct(col("subj")).as("n_subj"),
      countDistinct(col("obj")).as("n_obj"),
      sum(wCol).cast("long").as("total_weight"))
    val deg = edges.groupBy("pred", "subj")
      .agg(countDistinct(col("obj")).as("od"))
      .groupBy("pred").agg(
        max(col("od")).as("max_out"),
        when(max(col("od")) === 1, 1).otherwise(0).as("functional"))
    card.join(deg, "pred")
      .select("pred", "n_edges", "n_subj", "n_obj", "max_out",
        "functional", "total_weight")
      .orderBy("pred")
  }

  /** Edge delta between two generations of the same table (`KgMain diff`):
    * (added, removed, reweighted) counts in ONE pass over each side — a
    * single full-outer hash join on the edge key feeding one aggregate,
    * instead of three separate actions that would re-scan both generations.
    * Sides are keyed by (subj, pred, obj, lang), which is unique within a
    * published generation, so the join never fans out. */
  def generationDelta(a: DataFrame, b: DataFrame): (Long, Long, Long) = {
    val key = Seq("subj", "pred", "obj", "lang")
    val wa = a.select(key.map(col) :+ col("weight").as("wa"): _*)
    val wb = b.select(key.map(col) :+ col("weight").as("wb"): _*)
    val row = wa.join(wb, key, "full_outer").agg(
      coalesce(sum(when(col("wa").isNull, 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(col("wb").isNull, 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(col("wa").isNotNull && col("wb").isNotNull &&
        col("wa") =!= col("wb"), 1L).otherwise(0L)), lit(0L)))
      .head()
    (row.getLong(0), row.getLong(1), row.getLong(2))
  }
}
