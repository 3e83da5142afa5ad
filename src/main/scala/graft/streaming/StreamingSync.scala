package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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
      maxFilesPerBatch: Option[Int] = None,
      corefStateTable: Option[TableCommitter] = None,
      edgeTable: Option[TableCommitter] = None,
      nodeTable: Option[TableCommitter] = None,
      docTable: Option[TableCommitter] = None,
      langStateTable: Option[TableCommitter] = None): Long = {
    import spark.implicits._
    // detectLanguage streams via explicit cross-batch state (round-4; the
    // round-3 refusal's reason was the missing state): the per-conversation
    // LangDetect COUNTS row is associative over turns, so counters merged
    // across micro-batches in any arrival order equal the batch pipeline's
    // whole-conversation counts. Each batch stamps its supports with the
    // CUMULATIVE winner and — because a conversation whose language flips
    // lives in a bucket this batch rewrites anyway — re-keys the
    // conversation's EXISTING rows to the new language inside the same
    // merge, so one logical support never splits across two lang keys.
    require(!cfg.detectLanguage || langStateTable.isDefined,
      "detectLanguage=true on the streaming path needs a langStateTable " +
        "(the per-conversation profile counters live in their own bucketed " +
        "table, committed in lockstep with each batch)")
    // Derived-table propagation under detectLanguage (round-5): a language
    // flip re-keys support rows, and edges drop conv_id — so the flip
    // propagates into the edge delta as a RETRACT+EMIT pair derived from
    // the flipped conversations' PRE-batch support rows (read via the same
    // preBatchRead snapshot discipline as the node-refcount anti-join); an
    // edge key whose weight retires to zero drops, and node refcounts
    // decrement for dead keys exactly as they increment for created ones —
    // see derivedStep.
    // scoredLinking IS streaming-safe (round-4): contextual disambiguation
    // is per-(conv, turn, alias) over the turn's OWN tokens, and a turn is
    // never split across micro-batches — resolving inside foreachBatch is
    // content-identical to batch resolution (AmbiguityResolver scaladoc).
    //
    // corefResolution is streaming-safe too, via explicit cross-batch state:
    // the only conversation history the batch antecedent window consumes is
    // the LAST resolved mention before this batch (CorefResolver's window is
    // last-ignoring-nulls over strictly-earlier turn_idx), so a tiny
    // per-conversation state row — (last mention entity, its turn_idx, max
    // turn_idx seen) — seeded into the batch as one synthetic context row
    // reproduces the batch result exactly, PROVIDED turns of a conversation
    // arrive in turn_idx order across batches (in-batch disorder is fine —
    // the window sorts). Out-of-order cross-batch arrival is REFUSED loudly
    // (the batch sync re-extracts conversations whole and handles it).
    require(!cfg.corefResolution || corefStateTable.isDefined,
      "corefResolution=true on the streaming path needs a corefStateTable " +
        "(the per-conversation antecedent state lives in its own bucketed " +
        "table, committed in lockstep with each batch)")
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
    // mapping the table was built with (see PipelineConfig.bucketKeyExpr);
    // adoption onto a pre-pin table is guarded
    table.pinKeyExprOrVerify(cfg.bucketKeyExpr,
      PipelineConfig.DefaultBucketKeyExpr)
    // row SEMANTICS are a LINEAGE property, not a per-run choice: batches
    // merged under different extraction semantics (coref resolution, scored
    // vs rank-collapsed linking, the stamped language) disagree on row
    // content/keys for the same turns, so flipping any of these mid-table
    // silently mixes two semantics in one additive merge — pin the full
    // signature like the bucket mapping (the batch pipeline pins the same
    // signature per workDir; PipelineConfig.semanticsSig is shared so the
    // two paths can never drift apart on what counts as "semantics").
    // ADOPTION-GUARDED: a pre-pin table with published generations refuses
    // rather than adopting the current flags — its rows' semantics are
    // unknowable, and adoption would bless a possibly-different signature
    // onto them (the upgrade hole mirror-imaged from pinKeyExprOrVerify)
    table.pinSemanticsOrVerify(cfg.semanticsSig)
    // legacy pin, still written for forward compatibility of the metadata
    // layout; NOTE the adoption guard above supersedes it for published
    // pre-semantics-pin tables (they are refused outright, so this line
    // never acts as their compatibility path — a rebuild is required)
    table.pinOrVerify("coref_resolution", cfg.corefResolution.toString)
    corefStateTable.foreach { st =>
      st.pinOrVerify("bucket_count", B.toString)
      st.pinKeyExprOrVerify(cfg.bucketKeyExpr,
        PipelineConfig.DefaultBucketKeyExpr)
      // state lost / wrong table: supports built by committed prior batches
      // of a coref lineage MUST have their antecedent state alongside — an
      // empty state table here would silently drop every cross-batch
      // antecedent. (A mid-crash replay is fine: lastBatch is stamped only
      // after the state publish, so a committed stamp implies the state
      // generation exists.)
      if (cfg.corefResolution && table.currentGeneration("lastBatch").isDefined
          && table.currentGeneration().isDefined
          && st.currentGeneration().isEmpty)
        throw new IllegalStateException(
          "corefResolution lineage has committed batches but the coref state " +
            "table is empty — wrong/lost state table; rebuild from a fresh " +
            "checkpoint")
    }
    langStateTable.foreach { st =>
      st.pinOrVerify("bucket_count", B.toString)
      st.pinKeyExprOrVerify(cfg.bucketKeyExpr,
        PipelineConfig.DefaultBucketKeyExpr)
      // counter columns are POSITIONAL over the sorted profile keys: a
      // profile edit mid-lineage would silently re-index every counter
      st.pinOrVerify("lang_profiles",
        graft.text.LangDetect.signature(cfg.langProfiles))
      // state lost / wrong table: same guard as the coref state
      if (cfg.detectLanguage && table.currentGeneration("lastBatch").isDefined
          && table.currentGeneration().isDefined
          && st.currentGeneration().isEmpty)
        throw new IllegalStateException(
          "detectLanguage lineage has committed batches but the language " +
            "state table is empty — wrong/lost state table; rebuild from a " +
            "fresh checkpoint")
    }
    // derived-table propagation (edges/nodes, like the batch pipeline's
    // publishDerived*): node refcounts derive from edge-key creation, so
    // the two tables are wired together or not at all
    require(edgeTable.isDefined == nodeTable.isDefined,
      "edgeTable and nodeTable must be wired together (node refcounts are " +
        "derived from edge-key creation events)")
    require(docTable.isEmpty || edgeTable.isDefined,
      "docTable needs the edgeTable (docs rebuild from the post-merge edge " +
        "slice)")
    // obj-side widening scans the whole edge table per refresh — a
    // per-NIGHT cost the batch sync documents and accepts, but a
    // per-MICRO-BATCH full scan breaks the O(batch) ingest contract
    require(docTable.isEmpty || !cfg.refreshReferencingDocs,
      "refreshReferencingDocs is not supported by the streaming doc sink " +
        "(it widens every micro-batch to an O(table) edge scan); run the " +
        "batch sync for label-freshness refreshes")
    Seq(edgeTable, nodeTable, docTable).flatten.foreach { t =>
      t.pinOrVerify("bucket_count", B.toString)
      t.pinKeyExprOrVerify(cfg.bucketKeyExpr,
        PipelineConfig.DefaultBucketKeyExpr)
      // a lineage with committed batches whose derived tables are empty was
      // ingested WITHOUT propagation — late enabling would silently miss
      // every earlier batch's edges
      if (table.currentGeneration("lastBatch").isDefined &&
          table.currentGeneration().isDefined &&
          t.currentGeneration().isEmpty)
        throw new IllegalStateException(
          "derived-table propagation enabled over a stream lineage with " +
            "committed batches but an empty edge/node table — earlier " +
            "batches were never propagated; rebuild from a fresh checkpoint")
    }
    val bucketOf =
      PipelineConfig.bucketCol(cfg.bucketKeyExpr, "conv_id", B)

    // canonicalization parity with the batch path (KgPipeline
    // .computeSupports): under scoredLinking a shared alias is ambiguity to
    // resolve per mention (identity canon); otherwise mentions emit at
    // canonical-cluster granularity via the alias-connected components of
    // the catalog. The catalog is already driver-resident here, so the CC
    // map is computed ONCE up front and rides the extraction kernel's
    // broadcast dictionary into every micro-batch — a stream ingested
    // without it would key the same logical mention by raw entity id while
    // the batch sync keys it canonically: two divergent tables from one
    // corpus.
    val canon: Map[String, String] =
      if (cfg.scoredLinking) Map.empty
      else graft.sources.TranscriptGen.components(catalog)

    var merged = 0L
    val q = turns.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Turn], batchId: Long) =>
        val replayed =
          table.currentGeneration("lastBatch").exists(_.toLong >= batchId)
        if (!replayed) {
          val s = batch.sparkSession
          // K2 parity with the batch sync (KgPipeline.quarantined):
          // structurally-bad rows divert to the runId-scoped quarantine
          // table instead of flowing into the additive merge. Overwrite +
          // runId scoping keeps a crash-replay from double-appending.
          val good =
            if (!cfg.quarantineBadRows) batch
            else {
              val (g, bad) = graft.io.Quarantine.split(
                batch.toDF(), graft.io.Quarantine.turnChecks)
              bad.write.mode("overwrite").parquet(
                s"${cfg.workDir}/quarantine/run_id=stream-$ckptId-$batchId")
              g.as[Turn]
            }
          // the observation rides the batch materialization and counts THIS
          // batch's extracted support rows (pre-merge), not the table size
          val obs = new org.apache.spark.sql.Observation(s"ingest-$batchId")
          // under scoredLinking, extraction emits ambiguity sentinels and
          // the shared resolver re-maps them from the batch's own turns —
          // the same code path as the batch pipeline
          val extracted0 = Extractor.extract(good, catalog, markers,
            emitContext = cfg.corefResolution, canon = canon,
            sentinelAmbiguous = cfg.scoredLinking).toDF()
          val linked =
            if (cfg.scoredLinking)
              graft.link.AmbiguityResolver.resolve(extracted0, good, catalog)
            else extracted0
          // coref AFTER scored linking, exactly like the batch pipeline:
          // the cross-turn antecedent is the contextually-resolved entity,
          // never an ambiguity sentinel
          val (resolved, publishCorefState) =
            if (cfg.corefResolution)
              corefStep(good, linked, corefStateTable.get, bucketOf,
                s"stream-$ckptId-$batchId")
            else (linked, () => ())
          // config-driven normalization (P1 proplist / A4 normProp / A3
          // normObj / P2 value maps) — same stage order as the batch path:
          // extract -> scored linking -> coref -> normalize. A river config
          // honored by batch sync but ignored here would let blacklisted
          // predicates flow into the stream tables.
          val extracted = Extractor.normalize(resolved, cfg)
          // cumulative language detection BEFORE stamping (cross-batch
          // state; see langStep)
          val langState =
            if (cfg.detectLanguage)
              Some(langStep(good, langStateTable.get, cfg, bucketOf,
                s"stream-$ckptId-$batchId"))
            else None
          val grouped = extracted
            .groupBy("conv_id", "subj", "pred", "obj")
            .agg(count(lit(1)).as("weight"))
          val stampedLang = langState match {
            case Some((langNow, _, _, _)) =>
              // batch-conv-sized broadcastable join; pick() defaulted every
              // conversation, the coalesce only guards join-miss corners
              grouped.join(langNow, Seq("conv_id"), "left")
                .withColumn("lang", coalesce(col("lang"), lit(cfg.language)))
            case None => grouped.withColumn("lang", lit(cfg.language))
          }
          val supports = stampedLang
            .observe(obs, count(lit(1)).as("n"))
            .select(keyCols.map(col) :+ col("weight") :+
              bucketOf.as("bucket"): _*)
            // materialized once (batch-sized): consumed by the bucket-set
            // collect AND the merge below — recomputing the extraction per
            // consumer would double the batch work
            .localCheckpoint(true)
          merged += obs.get("n").asInstanceOf[Long]
          // the buckets this batch touches — at most B driver-side ints.
          // Under detectLanguage the batch's CONVERSATION buckets join in:
          // a conversation whose new turns carry no extractable support can
          // still flip its cumulative language, and its existing rows (in
          // those buckets) must be re-keyed even with no support delta
          val touched = supports.select("bucket").distinct()
            .collect().map(_.getInt(0)).toSet ++
            langState.map(_._2).getOrElse(Set.empty)
          if (touched.nonEmpty) {
            // additive merge WITHIN the touched buckets only: the current
            // generation's read is partition-pruned to them, and the publish
            // rewrites exactly them (hard-link carryover for the rest)
            val combined = table.read(s) match {
              case Some(cur) =>
                val pruned = cur
                  .filter(col("bucket").isin(touched.toSeq: _*)) // pruned
                  .select(keyCols.map(col) :+ col("weight"): _*)
                // language re-key: rows of batch conversations move to the
                // cumulative winner BEFORE the key-merge, so a flip unifies
                // old and new rows under one lang instead of splitting them
                val rekeyed = langState match {
                  case Some((langNow, _, _, _)) =>
                    pruned.join(langNow.withColumnRenamed("lang", "lang_now"),
                        Seq("conv_id"), "left")
                      .withColumn("lang",
                        coalesce(col("lang_now"), col("lang")))
                      .drop("lang_now")
                  case None => pruned
                }
                rekeyed
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
          // derived tables publish AFTER the supports and BEFORE the coref
          // state: recomputation inputs publish last, so a replay that sees
          // an advanced input always finds every consumer already published
          // (its wrong re-staging is discarded by runId idempotence)
          (edgeTable, nodeTable) match {
            case (Some(e), Some(n)) =>
              derivedStep(s, supports, e, n, docTable, cfg, B,
                cfg.bucketKeyExpr, s"stream-$ckptId-$batchId",
                supTbl = table, flips = langState.map(_._3))
            case _ =>
          }
          // coref + language state publish AFTER the supports and BEFORE
          // the stamp: then every crash window replays correctly (see
          // corefStep / langStep)
          publishCorefState()
          langState.foreach(_._4())
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

  /** Additive derived-table propagation: the streaming analogue of the
    * batch pipeline's edge/node publish (KgPipeline.publishDerived*), per
    * micro-batch and O(batch).
    *
    * Edge weights are sums of support weights, so the batch's support delta
    * aggregates straight into the edge table (pruned read of the touched
    * subj-buckets, bucket-granular publish). Node refcounts count DISTINCT
    * edge keys per entity, so they advance only on edge keys this batch
    * CREATES — detected with an anti-join against the PRE-batch edge
    * generation. On a replay whose edge publish already landed that is the
    * published generation's PARENT ([[preBatchRead]]); reading the advanced
    * generation instead would find zero "new" keys and publish a wrong
    * (empty-delta) node merge in the crash window where the node publish is
    * still pending.
    *
    * The ONE retirement path here is the detectLanguage flip (`flips`): a
    * flipped conversation's pre-batch support rows retract at the old lang
    * and emit at the new one, a key whose merged weight reaches zero drops
    * from the edge table, and node refcounts decrement for dead keys
    * symmetric to created ones. Everything else stays append-only —
    * vanished-data deletes belong to the batch sync.
    *
    * Crash safety: edges publish before nodes, both before the coref state
    * and the lastBatch stamp; publishes are runId-idempotent. Replay
    * windows: before edge publish — clean recompute; between edge and node
    * publish — parent-generation read reproduces the original new-key set,
    * edge re-publish no-ops, node publish completes; after node publish —
    * both no-op and the re-staging is discarded. */
  private def derivedStep(s: SparkSession, supports: DataFrame,
                          eTbl: TableCommitter, nTbl: TableCommitter,
                          docTbl: Option[TableCommitter], cfg: PipelineConfig,
                          B: Int, keyExpr: String, runId: String,
                          supTbl: TableCommitter = null,
                          flips: Option[DataFrame] = None): Unit = {
    val edgeBucket = PipelineConfig.bucketCol(keyExpr, "subj", B)
    val nodeBucket = PipelineConfig.bucketCol(keyExpr, "entity_id", B)
    val eKeys = Seq("subj", "pred", "obj", "lang")
    // language-flip propagation (detectLanguage): a flipped conversation's
    // PRE-batch support rows (snapshot read — the supports table already
    // advanced this batch) become a retract at the old lang (-weight) and
    // an emit at the new one (+weight). Edge weights are sums of support
    // weights over conversations, so the retract subtracts exactly this
    // conversation's contribution — a key retiring to zero drops below.
    val flipDelta: Option[DataFrame] = flips.filter(f => !f.isEmpty).flatMap { f =>
      preBatchRead(s, supTbl, runId).map { priorSup =>
        val flipBuckets = f
          .select(PipelineConfig.bucketCol(keyExpr, "conv_id", B).as("b"))
          .distinct().collect().map(_.getInt(0)).toSeq
        val rows = priorSup
          .filter(col("bucket").isin(flipBuckets: _*)) // pruned
          .join(f.select(col("conv_id"), col("lang").as("lang_new")),
            Seq("conv_id"), "inner")
        rows.select(col("subj"), col("pred"), col("obj"), col("lang"),
            (-col("weight")).as("weight"))
          .unionByName(rows.select(col("subj"), col("pred"), col("obj"),
            col("lang_new").as("lang"), col("weight")))
      }
    }
    val eDelta = flipDelta.foldLeft(
        supports.select((eKeys :+ "weight").map(col): _*))(_ unionByName _)
      .groupBy(eKeys.map(col): _*).agg(sum(col("weight")).as("weight"))
      .filter(col("weight") =!= 0L) // a flip's retract+emit can cancel
      .withColumn("bucket", edgeBucket)
      // batch-edge-sized; feeds the bucket set, the merge AND the new-key
      // anti-join — materialized once
      .localCheckpoint(true)
    val eTouched = eDelta.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    if (eTouched.isEmpty) return
    val pre = preBatchRead(s, eTbl, runId)
      .map(_.filter(col("bucket").isin(eTouched.toSeq: _*)) // pruned
        .select((eKeys :+ "weight").map(col): _*)
        .localCheckpoint(true)) // consumed by the merge and the anti-joins
    val combinedE = (pre match {
      case Some(cur) => cur.unionByName(eDelta.drop("bucket"))
        .groupBy(eKeys.map(col): _*).agg(sum(col("weight")).as("weight"))
      case None => eDelta.drop("bucket")
    }).filter(col("weight") > 0) // retired keys drop out of the table
      // consumed by the stage AND the created/dead key joins below
      .localCheckpoint(true)
    eTbl.stagePartitioned(combinedE.withColumn("bucket", edgeBucket), runId)
    eTbl.publishBuckets(runId, eTouched)

    // node refcounts count DISTINCT edge keys per entity: +1 per key this
    // batch CREATES (present after the merge, absent before), -1 per key it
    // RETIRES (present before, absent after — only possible under a flip)
    val newKeys = pre match {
      case Some(cur) =>
        combinedE.join(cur.select(eKeys.map(col): _*), eKeys, "left_anti")
      case None => combinedE
    }
    val deadKeys = pre match {
      case Some(cur) if flipDelta.isDefined =>
        cur.join(combinedE.select(eKeys.map(col): _*), eKeys, "left_anti")
      case _ => null
    }
    val refDelta = Option(deadKeys).foldLeft(
      newKeys.select(explode(array(col("subj"), col("obj"))).as("entity_id"),
        lit(1L).as("d")))((acc, dead) => acc.unionByName(
      dead.select(explode(array(col("subj"), col("obj"))).as("entity_id"),
        lit(-1L).as("d"))))
    val nDelta = refDelta
      .groupBy("entity_id").agg(sum(col("d")).as("refs"))
      .filter(col("refs") =!= 0L)
      .withColumn("bucket", nodeBucket)
      .localCheckpoint(true)
    val nTouched = nDelta.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    if (nTouched.nonEmpty) {
      val combinedN = (nTbl.read(s) match {
        case Some(cur) => cur
          .filter(col("bucket").isin(nTouched.toSeq: _*)) // pruned
          .select(col("entity_id"), col("refs"))
          .unionByName(nDelta.drop("bucket"))
          .groupBy("entity_id").agg(sum(col("refs")).as("refs"))
        case None => nDelta.drop("bucket")
      }).filter(col("refs") > 0) // an entity with no remaining edges drops
      nTbl.stagePartitioned(combinedN.withColumn("bucket", nodeBucket), runId)
      nTbl.publishBuckets(runId, nTouched)
    }

    // optional doc sink, per micro-batch (the batch sync's incremental doc
    // rebuild at batch granularity): docs pivot per (subj, lang) over ALL
    // of a subject's edges, and edges are subject-bucketed — rebuild docs
    // for the batch's changed subjects from their pruned POST-merge edge
    // slice, keep every other doc in those buckets, hard-link the rest.
    // Label lookups (uriDescription) are slice-obj-restricted and
    // bucket-pruned exactly like the batch path (labels of URI u live under
    // subject u); a label arriving in a LATER batch does not refresh docs
    // already rendered — the same staleness as the batch sync and the
    // reference (unchanged resources are not re-indexed). Replay-safe with
    // NO snapshot gymnastics: the doc input is the post-merge edge
    // generation, which is what every replay window reads too (later
    // batches have not run), and a published doc runId no-ops.
    //
    // Skip condition: with no created keys and no flips, every doc would
    // re-render byte-identically (weights do not render) — the historical
    // fast path. Under a flip the per-entity ref deltas can CANCEL
    // (retire at en + create at cs), so nTouched alone cannot prove docs
    // unchanged and the rebuild always runs.
    val docsUnchanged = nTouched.isEmpty && flipDelta.isEmpty
    docTbl.filter(_ => !docsUnchanged).foreach { dTbl =>
      val changedSubj = eDelta.select("subj").distinct().localCheckpoint(true)
      val postEdges = eTbl.read(s).get
      val slice = postEdges
        .filter(col("bucket").isin(eTouched.toSeq: _*)) // pruned
        .join(changedSubj, Seq("subj"), "left_semi")
        .select("subj", "pred", "obj", "lang")
      val sliceObjs = slice.select(col("obj").as("subj")).distinct()
        .localCheckpoint(true)
      val objBuckets = sliceObjs
        .select(PipelineConfig.bucketCol(keyExpr, "subj", B).as("b"))
        .distinct().collect().map(_.getInt(0)).toSet
      val labelSrc = postEdges
        .filter(col("bucket").isin(objBuckets.toSeq: _*)) // pruned
        .join(sliceObjs, Seq("subj"), "left_semi")
        .select("subj", "pred", "obj", "lang")
      val rebuilt = graft.materialize.DocAssembler.assemble(
        slice, cfg, labelSource = Some(labelSrc))
      val combinedD = dTbl.read(s) match {
        case Some(curD) => rebuilt.unionByName(curD
          .filter(col("bucket").isin(eTouched.toSeq: _*)) // pruned
          .drop("bucket")
          .join(changedSubj, Seq("subj"), "left_anti"))
        case None => rebuilt
      }
      dTbl.stagePartitioned(combinedD.withColumn("bucket", edgeBucket), runId)
      dTbl.publishBuckets(runId, eTouched)
    }
  }

  /** The table as it stood BEFORE this runId's publish: the current
    * generation normally; the published generation's PARENT when this
    * runId already published (the crash-replay window). Fails loudly if
    * retention expired the parent mid-replay — treating it as empty would
    * re-derive deltas the table already absorbed. */
  /** Cross-batch language state for the streaming ingest (detectLanguage).
    *
    * Merges the batch's per-conversation [[graft.text.LangDetect]] counts
    * into the prior state (pruned to the batch's conversation buckets) and
    * returns the CUMULATIVE winner per conversation, the supports-table
    * buckets needing a re-key (buckets of conversations whose winner
    * CHANGED vs the prior state — the steady-state no-flip batch adds
    * nothing, preserving the O(batch-delta) ingest contract), and the
    * lockstep state publish (which always covers every state bucket the
    * batch touches: the counters themselves advance even when no winner
    * flips). Because the counts row is associative over turns, the
    * cumulative winner after ingesting a corpus equals the batch pipeline's
    * whole-conversation detection no matter how the turns were split across
    * micro-batches — and unlike the coref state there is no arrival-order
    * requirement at all.
    *
    * Crash-replay: publishes are runId-idempotent; a replay that observes
    * an already-advanced state recomputes values whose publishes are all
    * discarded — the same argument as corefStep. */
  private def langStep(batch: Dataset[Turn], st: TableCommitter,
                       cfg: PipelineConfig, bucketOf: Column,
                       runId: String): (DataFrame, Set[Int], DataFrame, () => Unit) = {
    val s = batch.sparkSession
    val profs = graft.text.LangDetect.sortedProfiles(cfg.langProfiles)
    val k = profs.size
    val bCounts = graft.text.LangDetect.counts(batch.toDF(), profs)
      .withColumn("bucket", bucketOf)
      .localCheckpoint(true) // feeds the bucket set AND the state merge
    val touched = bCounts.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    val stateCols = ("conv_id" +: (0 until k).map(i => s"hits_$i")) :+ "n_toks"
    // pruned to the touched buckets; conversations of those buckets NOT
    // in this batch ride through the merge unchanged (the bucket-level
    // publish rewrites whole buckets, so they must stay aboard)
    val prior = st.read(s).map(
      _.filter(col("bucket").isin(touched.toSeq: _*))
        .select(stateCols.map(col): _*)
        .localCheckpoint(true)) // consumed by the merge AND the flip detect
    val cum = prior match {
      case Some(p) => graft.text.LangDetect.merge(p, bCounts.drop("bucket"), k)
      case None => bCounts.drop("bucket")
    }
    // consumed by the winner pick AND the state publish — materialized once
    val cumM = cum.localCheckpoint(true)
    // consumed by the support stamp AND the re-key join
    val langNow = graft.text.LangDetect.pick(cumM, profs, cfg.language)
      .localCheckpoint(true)
    // re-key work = conversations whose winner FLIPPED: a conversation
    // with no prior state has no published rows to re-key, and a stable
    // winner leaves its bucket untouched (else every chatty conversation
    // would force a byte-identical bucket rewrite per batch). The flip
    // rows (conv_id, lang_prior, lang) also drive the derived tables'
    // retract+emit propagation (see derivedStep).
    val flips: DataFrame = (prior match {
      case None =>
        langNow.limit(0).withColumn("lang_prior", lit(""))
      case Some(p) =>
        val priorWin = graft.text.LangDetect.pick(p, profs, cfg.language)
          .withColumnRenamed("lang", "lang_prior")
        langNow.join(priorWin, Seq("conv_id"), "inner")
          .filter(col("lang") =!= col("lang_prior"))
    }).select("conv_id", "lang_prior", "lang")
      .localCheckpoint(true) // batch-conv-bounded; bucket set + derived deltas
    val flipped: Set[Int] = flips.select(bucketOf.as("bucket")).distinct()
      .collect().map(_.getInt(0)).toSet
    (langNow, flipped, flips, () => {
      if (touched.nonEmpty) {
        st.stagePartitioned(cumM.withColumn("bucket", bucketOf), runId)
        st.publishBuckets(runId, touched)
      }
      ()
    })
  }

  private def preBatchRead(s: SparkSession, tbl: TableCommitter,
                           runId: String): Option[DataFrame] =
    tbl.publishedGeneration(runId) match {
      case None => tbl.read(s)
      case Some(gen) =>
        val n = gen.stripPrefix("gen-").toLong
        if (n == 0) None
        else Some(tbl.readGeneration(s, s"gen-${n - 1}").getOrElse(sys.error(
          s"replaying $runId needs the pre-batch snapshot gen-${n - 1}, " +
            "but retention expired it — raise retention or rebuild from a " +
            "fresh checkpoint")))
    }

  /** Cross-batch coreference for the streaming ingest.
    *
    * The batch antecedent window ([[graft.extract.CorefResolver.resolve]])
    * consumes, per orphan, only the latest context row with a strictly
    * smaller turn_idx — so the whole conversation history compresses to one
    * state row per conversation: (last_idx, last_ent) of the latest resolved
    * mention plus max_idx of the latest turn seen. That row re-enters the
    * batch as a synthetic context row and the UNCHANGED batch resolver runs
    * over batch rows + seeds; seeds only ever contribute context (which the
    * resolver drops from its output), so every emitted triple belongs to
    * this batch.
    *
    * PARITY CONTRACT: turns of one conversation must arrive in turn_idx
    * order ACROSS batches (in-batch disorder is fine — the window sorts).
    * A violating batch is refused loudly: silently resolving against a
    * future-relative-to-the-straggler state would diverge from the batch
    * pipeline, which re-extracts conversations whole.
    *
    * CRASH SAFETY (state publishes after supports, before the lastBatch
    * stamp; publishes are runId-idempotent):
    *  - crash before the supports publish — replay recomputes from the
    *    un-advanced state: identical output;
    *  - crash between supports and state publish — replay recomputes from
    *    the un-advanced state, the supports re-publish no-ops, the state
    *    publish completes;
    *  - crash between state publish and stamp — replay recomputes against
    *    the ADVANCED state (wrong antecedents), but BOTH publishes no-op on
    *    the already-published runId, so the wrong staging is discarded (and
    *    the order guard is skipped for an already-published runId, so the
    *    replay can never wedge on the advancement it made itself).
    *
    * Scale: the state table is conversation-count-sized, bucketed with the
    * support table's pinned mapping; a batch reads and rewrites only the
    * buckets its conversations map to (hard-link carryover for the rest).
    *
    * @return (batch extraction with orphans resolved and context rows
    *         dropped, thunk publishing the advanced state) */
  private def corefStep(batch: Dataset[Turn], extracted: DataFrame,
                        st: TableCommitter, bucketOf: Column,
                        runId: String): (DataFrame, () => Unit) = {
    val s = batch.sparkSession
    import s.implicits._
    // per-conversation batch bounds: one pass over the (in-memory) batch;
    // feeds the order guard, the seed join and the state update
    val batchConvs = batch.toDF().groupBy("conv_id")
      .agg(min(col("turn_idx")).as("b_min"), max(col("turn_idx")).as("b_max"))
      .withColumn("bucket", bucketOf)
      .localCheckpoint(true)
    val touched = batchConvs.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    if (touched.isEmpty) return (extracted, () => ())

    val prior = st.read(s) match {
      case Some(cur) => cur
        .filter(col("bucket").isin(touched.toSeq: _*)) // partition-pruned
        .select("conv_id", "last_idx", "last_ent", "max_idx")
      case None =>
        Seq.empty[(String, Option[Int], Option[String], Int)]
          .toDF("conv_id", "last_idx", "last_ent", "max_idx")
    }
    // state rows of THIS batch's conversations (batch-conv-sized, consumed
    // by the guard, the seeds and the update — materialized once)
    val priorForBatch = prior
      .join(batchConvs.select("conv_id", "b_min", "b_max"),
        Seq("conv_id"), "inner")
      .localCheckpoint(true)

    // replay tolerance: when THIS runId's state generation is already
    // published (crash landed between the state publish and the lastBatch
    // stamp), the batch's turns legitimately compare as "out of order"
    // against the state they themselves advanced — but everything this
    // replay computes is discarded by runId idempotence anyway, so the
    // guard must not wedge the recovery
    val alreadyPublished = st.publishedGeneration(runId).isDefined
    val bad =
      if (alreadyPublished) Array.empty[org.apache.spark.sql.Row]
      else priorForBatch.filter(col("b_min") <= col("max_idx"))
        .select("conv_id", "b_min", "max_idx").take(1)
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"out-of-order cross-batch arrival for conversation " +
          s"${bad.head.getString(0)}: batch turn_idx ${bad.head.getInt(1)} <= " +
          s"already-ingested max ${bad.head.getInt(2)} — streamed coref " +
          "would diverge from the batch pipeline; re-sync this table with " +
          "the batch path")

    val seeds = priorForBatch.filter(col("last_ent").isNotNull)
      .select(col("conv_id"), col("last_idx").as("turn_idx"),
        lit("__ctx__").as("subj"),
        lit(Extractor.LastMentionPred).as("pred"),
        col("last_ent").as("obj"))
    val resolved =
      graft.extract.CorefResolver.resolve(extracted.unionByName(seeds))

    // the batch's own latest resolved mention per conversation (from the
    // PRE-seed rows — seeds must not echo back into the state)
    val batchLast = extracted
      .filter(col("pred") === Extractor.LastMentionPred)
      .groupBy("conv_id")
      .agg(max(struct(col("turn_idx"), col("obj"))).as("m"))
      .select(col("conv_id"), col("m.turn_idx").as("n_idx"),
        col("m.obj").as("n_ent"))
    val updates = batchConvs.select("conv_id", "b_max")
      .join(batchLast, Seq("conv_id"), "left")
      .join(prior, Seq("conv_id"), "left")
      .select(col("conv_id"),
        coalesce(col("n_idx"), col("last_idx")).as("last_idx"),
        coalesce(col("n_ent"), col("last_ent")).as("last_ent"),
        greatest(col("b_max"), coalesce(col("max_idx"), lit(-1)))
          .as("max_idx"))
    val carry = prior
      .join(batchConvs.select("conv_id"), Seq("conv_id"), "left_anti")
    val newState = carry.unionByName(updates).withColumn("bucket", bucketOf)

    (resolved, () => {
      st.stagePartitioned(newState, runId)
      st.publishBuckets(runId, touched)
      ()
    })
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
