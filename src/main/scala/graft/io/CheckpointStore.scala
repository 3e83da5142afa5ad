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

  // the watermark table's schema is fixed by writeWatermark; providing it to
  // the reader skips one footer-based schema-inference Spark job per read —
  // the sync path reads this table on every run, and a no-op sync is
  // fixed-overhead bound
  private val wmSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("pipeline_id",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("run_id",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("watermark",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("status",
      org.apache.spark.sql.types.StringType)))

  private def readWm(spark: SparkSession): DataFrame = {
    // schema given, but existence still probed: .schema() defers the
    // missing-path error to action time, losing the AnalysisException the
    // callers map to "no table yet"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(wmPath)))
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "PATH_NOT_FOUND", messageParameters = Map("path" -> wmPath))
    spark.read.schema(wmSchema).parquet(wmPath)
  }

  private def withJobDesc[T](spark: SparkSession, desc: String)(body: => T): T =
    SparkIo.withJobDesc(spark, s"ckpt:$desc")(body)

  def writeWatermark(spark: SparkSession, pipelineId: String, runId: String,
                     watermark: Timestamp, status: String): Unit = {
    import spark.implicits._
    withJobDesc(spark, "watermark-write") {
      Seq((pipelineId, runId, watermark, status))
        .toDF("pipeline_id", "run_id", "watermark", "status")
        .write.mode("append").parquet(wmPath)
    }
  }

  /** Highest successful watermark — the reference reads `last_update` before
    * composing the sync FILTER (Harvester.java:628-651). */
  def lastWatermark(spark: SparkSession, pipelineId: String): Option[Timestamp] =
    try {
      withJobDesc(spark, "watermark-read")(readWm(spark)
        .filter(col("pipeline_id") === pipelineId && col("status") === "success")
        .agg(max(col("watermark")))
        .head()) match {
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
      val r = withJobDesc(spark, "epoch-read")(readWm(spark)
        .filter(col("pipeline_id") === pipelineId && col("status") === "success")
        .agg(count(lit(1)), max(col("watermark")))
        .head())
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getTimestamp(1)))
    } catch {
      case _: org.apache.spark.sql.AnalysisException => (0L, None)
    }

  def writeMetrics(spark: SparkSession, runId: String,
                   rows: Seq[(String, String, Long)]): Unit = {
    import spark.implicits._
    withJobDesc(spark, "metrics-write") {
      rows.map { case (stage, metric, v) => (runId, stage, metric, v) }
        .toDF("run_id", "stage", "metric", "value")
        .write.mode("append").parquet(metricsPath)
    }
  }

  /** Per-partition lineage for an already-checkpointed stage, read from the
    * checkpoint's parquet FOOTERS (each writer task produced one file whose
    * footer carries its row count; partition_id = the writer task's number
    * from the file name) — metadata-only, so recording lineage for a 100 TB
    * supports checkpoint costs zero data reads. A DataFrame-scan variant
    * (groupBy(spark_partition_id)) would re-read every row because the
    * grouping defeats Spark's metadata-only count. One small Spark job
    * remains: the append of the lineage rows themselves. */
  def writeLineageFromFooters(spark: SparkSession, runId: String, stage: String,
                              checkpointDir: String): Unit = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(checkpointDir))
    val parts =
      try s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
      finally s.close()
    val rows = parts.map { f =>
      val name = f.getFileName.toString // part-00007-<uuid>... -> 7
      val pid = name.stripPrefix("part-").takeWhile(_.isDigit).toInt
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.toUri), conf))
      try pid -> rdr.getRecordCount finally rdr.close()
    }
    withJobDesc(spark, s"lineage-write:$stage") {
      rows.map { case (pid, n) => (pid, n, runId, stage) }
        .toDF("partition_id", "rows", "run_id", "stage")
        .write.mode("append").parquet(lineagePath)
    }
  }

  def metrics(spark: SparkSession): Option[DataFrame] =
    try Some(spark.read.parquet(metricsPath)) catch { case _: Exception => None }

  def lineage(spark: SparkSession): Option[DataFrame] =
    try Some(spark.read.parquet(lineagePath)) catch { case _: Exception => None }
}
