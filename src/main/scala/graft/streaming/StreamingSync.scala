package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.config.PipelineConfig
import graft.extract.Extractor
import graft.io.TableCommitter
import graft.schema.{CatalogEntry, Turn}

/** Structured-Streaming front-end for incremental ingestion: the reference's
  * cron-driven timestamp-filtered batch sync (SURVEY.md §2.8) upgraded to
  * `readStream` + `Trigger.AvailableNow` — source offsets replace the
  * hand-rolled `last_update` watermark, and each micro-batch MERGEs extracted
  * supports through the same committer as the batch path (exactly-once via
  * checkpointed offsets + idempotent key merge).
  *
  * Also provides the watermarked tumbling-window mention-rate aggregate —
  * the standard streaming shape (windowed agg + late-data watermark). */
object StreamingSync {

  /** Ingest every available file once, extracting and merging per batch.
    * @return rows merged. */
  def ingestAvailableNow(
      spark: SparkSession, inputDir: String, checkpointDir: String,
      catalog: Seq[CatalogEntry], markers: Map[String, String],
      cfg: PipelineConfig, table: TableCommitter): Long = {
    import spark.implicits._
    val schema = implicitly[org.apache.spark.sql.Encoder[Turn]].schema
    val turns = spark.readStream.schema(schema).parquet(inputDir).as[Turn]

    var merged = 0L
    val q = turns.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Turn], batchId: Long) =>
        val supports = Extractor.extract(batch, catalog, markers).toDF()
          .groupBy("conv_id", "subj", "pred", "obj")
          .agg(count(lit(1)).as("weight"))
          .withColumn("lang", lit(cfg.language))
        merged += supports.count()
        table.merge(batch.sparkSession, supports,
          Seq("conv_id", "subj", "pred", "obj", "lang"), s"stream-$batchId")
        ()
      }
      .start()
    q.awaitTermination()
    merged
  }

  /** Watermarked tumbling-window aggregate over the turn stream: mentions
    * per (window, role), tolerating 10 minutes of late data. */
  def mentionRate(turns: DataFrame): DataFrame =
    turns
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("role"))
      .agg(count(lit(1)).as("n_turns"))
}
