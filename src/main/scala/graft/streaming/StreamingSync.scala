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
    *
    * O(batch), not O(table): the support table is physically bucketed on
    * hash(conv_id) with the bucket count pinned in the table's metadata, so a
    * micro-batch touching k conversations re-aggregates and rewrites only
    * their buckets (pruned read of the current generation + bucket-level
    * dynamic partition overwrite); every untouched bucket carries into the
    * new generation by hard link — the same mechanism as the batch sync's
    * incremental publish (KgPipeline.runSync). A trickle of micro-batches
    * over a 100 TB table therefore costs per-batch work proportional to the
    * batch, never a full-table rewrite.
    *
    * Weights merge ADDITIVELY (existing + new per key): weight is an
    * occurrence count, so a conversation whose turns are split across
    * micro-batches accumulates the same totals as a single batch would —
    * no batch-atomicity requirement on the source.
    *
    * foreachBatch is at-least-once for side effects; additive merges are NOT
    * naturally idempotent, so each publish stamps a `lastBatch` pointer and a
    * replayed batchId is skipped — together with the checkpointed source
    * offsets this restores exactly-once table contents (publishes are also
    * runId-idempotent in the committer, covering a crash between the publish
    * and the stamp).
    *
    * The per-batch row count rides the batch materialization via
    * Dataset.observe — no extra extraction pass just for the counter.
    *
    * @return rows merged across all fresh batches. */
  def ingestAvailableNow(
      spark: SparkSession, inputDir: String, checkpointDir: String,
      catalog: Seq[CatalogEntry], markers: Map[String, String],
      cfg: PipelineConfig, table: TableCommitter,
      maxFilesPerBatch: Option[Int] = None): Long = {
    import spark.implicits._
    // the streaming path stamps cfg.language directly; silently diverging
    // from a detectLanguage batch table would split the same logical support
    // across two lang keys in the additive merge — refuse loudly instead
    require(!cfg.detectLanguage,
      "detectLanguage is not supported by the streaming ingest path " +
        "(per-conversation detection needs cross-batch state); use the batch " +
        "sync or stamp a fixed language")
    // scoredLinking IS streaming-safe (round-4): contextual disambiguation
    // is per-(conv, turn, alias) over the turn's OWN tokens, and a turn is
    // never split across micro-batches — resolving inside foreachBatch is
    // content-identical to batch resolution (AmbiguityResolver scaladoc).
    // detectLanguage/coref stay refused: both need cross-batch state.
    // coref needs the conversation's FULL turn history (the antecedent
    // window looks at strictly-earlier turns); a micro-batch can split a
    // conversation, so streamed orphan resolution would silently diverge
    // from the batch pipeline, which re-extracts changed conversations whole
    require(!cfg.corefResolution,
      "corefResolution is not supported by the streaming ingest path " +
        "(cross-turn antecedents need whole-conversation context); use the " +
        "batch sync")
    val schema = implicitly[org.apache.spark.sql.Encoder[Turn]].schema
    val reader = spark.readStream.schema(schema)
    val turns = maxFilesPerBatch
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(inputDir).as[Turn]
    val keyCols = Seq("conv_id", "subj", "pred", "obj", "lang")

    // batchIds are only meaningful relative to ONE checkpoint lineage: stamp
    // the checkpoint dir with an identity and refuse to run a fresh
    // checkpoint (batchIds restarting at 0) over a table built by another —
    // skipping would silently drop genuinely new data as "replayed", and
    // reprocessing would double-count the additive merge.
    val ckptId = checkpointIdentity(checkpointDir)
    val storedCkpt = table.currentGeneration("lastBatchCkpt")
    // strict: a NON-EMPTY table may only be ingested into by the lineage
    // that built it. Same-lineage is proven by the stamp OR by this
    // lineage's own batch-0 publish record (covers a crash after the first
    // publish but before any stamp); anything else — including a recreated
    // checkpoint whose batch 0 would re-merge data the table already
    // holds — is refused rather than silently double-counted or skipped.
    val sameLineage = storedCkpt.contains(ckptId) ||
      table.publishedGeneration(s"stream-$ckptId-0").isDefined
    if (table.currentGeneration().isDefined && !sameLineage)
      throw new IllegalStateException(
        s"checkpoint $checkpointDir is not the lineage that built this table " +
          s"(stored id ${storedCkpt.getOrElse("<none>")}): restore the " +
          "original checkpoint or start a new table — replaying from batch 0 " +
          "over an additively-merged table would double-count")

    // upgrade guard BEFORE pinning: a table published by a pre-bucketing
    // writer has no bucket= partition layout, and pinning bucket_count on
    // it would turn the pruned read below into an opaque unresolved-column
    // AnalysisException — fail with an explicit migration message instead
    if (table.currentIsBucketed().contains(false))
      throw new IllegalStateException(
        "this table was published without the bucketed layout (no 'bucket' " +
          "partition column): rebuild it from a fresh checkpoint with the " +
          "bucketed streaming ingest before resuming")
    // bucket count pinned in the table's own metadata: the key-to-bucket
    // mapping is baked into every published generation, and every writer
    // (including a later run with a different config) must agree on it
    val B = cfg.syncBuckets
    table.pinOrVerify("bucket_count", B.toString)
    // key expression pinned too — this writer must bucket with the exact
    // mapping the table was built with (see PipelineConfig.bucketKeyExpr)
    table.pinOrVerify("bucket_key_expr", cfg.bucketKeyExpr)
    val bucketOf =
      pmod(expr(cfg.bucketKeyExpr.replace("{k}", "conv_id")), lit(B))

    var merged = 0L
    val q = turns.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Turn], batchId: Long) =>
        val replayed =
          table.currentGeneration("lastBatch").exists(_.toLong >= batchId)
        if (!replayed) {
          val s = batch.sparkSession
          // the observation rides the batch materialization and counts THIS
          // batch's extracted support rows (pre-merge), not the table size
          val obs = new org.apache.spark.sql.Observation(s"ingest-$batchId")
          // under scoredLinking, extraction emits ambiguity sentinels and
          // the shared resolver re-maps them from the batch's own turns —
          // the same code path as the batch pipeline
          val extracted0 = Extractor.extract(batch, catalog, markers,
            sentinelAmbiguous = cfg.scoredLinking).toDF()
          val extracted =
            if (cfg.scoredLinking)
              graft.link.AmbiguityResolver.resolve(extracted0, batch, catalog)
            else extracted0
          val supports = extracted
            .groupBy("conv_id", "subj", "pred", "obj")
            .agg(count(lit(1)).as("weight"))
            .withColumn("lang", lit(cfg.language))
            .observe(obs, count(lit(1)).as("n"))
            .select(keyCols.map(col) :+ col("weight") :+
              bucketOf.as("bucket"): _*)
            // materialized once (batch-sized): consumed by the bucket-set
            // collect AND the merge below — recomputing the extraction per
            // consumer would double the batch work
            .localCheckpoint(true)
          merged += obs.get("n").asInstanceOf[Long]
          // the buckets this batch touches — at most B driver-side ints
          val touched = supports.select("bucket").distinct()
            .collect().map(_.getInt(0)).toSet
          if (touched.nonEmpty) {
            // additive merge WITHIN the touched buckets only: the current
            // generation's read is partition-pruned to them, and the publish
            // rewrites exactly them (hard-link carryover for the rest)
            val combined = table.read(s) match {
              case Some(cur) =>
                cur.filter(col("bucket").isin(touched.toSeq: _*)) // pruned
                  .select(keyCols.map(col) :+ col("weight"): _*)
                  .unionByName(supports.drop("bucket"))
                  .groupBy(keyCols.map(col): _*)
                  .agg(sum(col("weight")).as("weight"))
              case None =>
                supports.drop("bucket")
            }
            // runId scoped by lineage id: publish idempotence records must
            // never collide across checkpoint lineages (a fresh lineage's
            // batch 0 is a different logical batch than an old lineage's)
            table.stagePartitioned(
              combined.withColumn("bucket", bucketOf), s"stream-$ckptId-$batchId")
            table.publishBuckets(s"stream-$ckptId-$batchId", touched)
          }
          // lineage id BEFORE the batch stamp: a crash between the two must
          // never leave lastBatch set with no (or a stale) lineage id — the
          // strict guard above would then brick or bypass the table
          table.setPointer("lastBatchCkpt", ckptId)
          table.setPointer("lastBatch", batchId.toString)
        }
        ()
      }
      .start()
    q.awaitTermination()
    merged
  }

  /** Stable identity of a checkpoint directory (created on first use;
    * written atomically — a kill mid-write must never leave a truncated id
    * that silently becomes the lineage identity). */
  private def checkpointIdentity(checkpointDir: String): String = {
    val dir = java.nio.file.Paths.get(checkpointDir)
    java.nio.file.Files.createDirectories(dir)
    val f = dir.resolve("graft-ckpt-id")
    if (java.nio.file.Files.exists(f))
      java.nio.file.Files.readString(f).trim
    else {
      val id = java.util.UUID.randomUUID().toString
      val tmp = dir.resolve(s".graft-ckpt-id.${java.util.UUID.randomUUID()}.tmp")
      java.nio.file.Files.writeString(tmp, id)
      try {
        java.nio.file.Files.move(tmp, f,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        id
      } catch {
        // lost the first-initializer race: adopt the winner's id
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.FileSystemException =>
          java.nio.file.Files.deleteIfExists(tmp)
          java.nio.file.Files.readString(f).trim
      }
    }
  }

  /** Watermarked tumbling-window aggregate over the turn stream: mentions
    * per (window, role), tolerating 10 minutes of late data. */
  def mentionRate(turns: DataFrame): DataFrame =
    turns
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("role"))
      .agg(count(lit(1)).as("n_turns"))
}
