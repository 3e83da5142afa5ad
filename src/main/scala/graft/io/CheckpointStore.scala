package graft.io

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Watermark + metrics + lineage tables (K7/A9: the `<index>_status`
  * `last_update` doc, Harvester.java:587-651, and UpdateRecord history,
  * UpdateRecord.java:13-27 — as append-only parquet tables).
  *
  * Append-only: each run adds rows; readers take the max successful
  * watermark per pipeline. Per-partition lineage rows give the north rule's
  * "per-partition lineage + metrics".
  */
final class CheckpointStore(root: String) {

  private def wmPath = s"$root/watermarks"
  private def metricsPath = s"$root/metrics"
  private def lineagePath = s"$root/lineage"

  def writeWatermark(spark: SparkSession, pipelineId: String, runId: String,
                     watermark: Timestamp, status: String): Unit = {
    import spark.implicits._
    Seq((pipelineId, runId, watermark, status))
      .toDF("pipeline_id", "run_id", "watermark", "status")
      .write.mode("append").parquet(wmPath)
  }

  /** Highest successful watermark — the reference reads `last_update` before
    * composing the sync FILTER (Harvester.java:628-651). */
  def lastWatermark(spark: SparkSession, pipelineId: String): Option[Timestamp] =
    try {
      spark.read.parquet(wmPath)
        .filter(col("pipeline_id") === pipelineId && col("status") === "success")
        .agg(max(col("watermark")))
        .head() match {
          case r if r.isNullAt(0) => None
          case r => Some(r.getTimestamp(0))
        }
    } catch {
      // only "table does not exist yet" maps to None; real read errors must
      // surface — swallowing them would silently reset the watermark to
      // epoch and turn the next sync into a full re-harvest
      case _: org.apache.spark.sql.AnalysisException => None
    }

  /** Sync EPOCH in one scan: (number of successful runs, highest successful
    * watermark). Watermarks alone cannot number syncs (an empty sync leaves
    * the watermark unchanged), and run ids must be unique per logical sync
    * yet stable across crash-retries of the same one. */
  def syncEpoch(spark: SparkSession, pipelineId: String): (Long, Option[Timestamp]) =
    try {
      val r = spark.read.parquet(wmPath)
        .filter(col("pipeline_id") === pipelineId && col("status") === "success")
        .agg(count(lit(1)), max(col("watermark")))
        .head()
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getTimestamp(1)))
    } catch {
      case _: org.apache.spark.sql.AnalysisException => (0L, None)
    }

  def writeMetrics(spark: SparkSession, runId: String,
                   rows: Seq[(String, String, Long)]): Unit = {
    import spark.implicits._
    rows.map { case (stage, metric, v) => (runId, stage, metric, v) }
      .toDF("run_id", "stage", "metric", "value")
      .write.mode("append").parquet(metricsPath)
  }

  /** Per-partition lineage: one row per (run, stage, partition) with its row
    * count — written from the executors via a partition-level aggregation,
    * not a driver collect. */
  def writeLineage(spark: SparkSession, runId: String, stage: String,
                   df: DataFrame): Unit = {
    df.groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("rows"))
      .withColumn("run_id", lit(runId))
      .withColumn("stage", lit(stage))
      .write.mode("append").parquet(lineagePath)
  }

  def metrics(spark: SparkSession): Option[DataFrame] =
    try Some(spark.read.parquet(metricsPath)) catch { case _: Exception => None }

  def lineage(spark: SparkSession): Option[DataFrame] =
    try Some(spark.read.parquet(lineagePath)) catch { case _: Exception => None }
}
