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
}
