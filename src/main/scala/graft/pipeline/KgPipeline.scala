package graft.pipeline

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.canon.ConnectedComponents
import graft.config.PipelineConfig
import graft.extract.Extractor
import graft.io.{CheckpointStore, Quarantine, TableCommitter}
import graft.schema.{CatalogEntry, Turn}

/** End-to-end KG construction: read -> stable order + salted partitioning ->
  * extract -> normalize -> canonicalize (CC) -> materialize node/edge tables
  * with atomic publish; full and incremental-sync modes; stage-checkpointed
  * for resume-from-failure.
  *
  * Scale design (north rule):
  *  - turns are repartitioned on (conv_id, salt(turn_idx)) so a hot
  *    conversation spreads over `saltBuckets` tasks instead of one straggler;
  *    extraction is per-turn, so no conv-level state needs co-location.
  *  - the support table is keyed per conversation, so incremental sync is
  *    dynamic-partition-overwrite of only the changed conversations —
  *    recomputing a conversation is idempotent and replaces exactly its rows.
  *  - every stage writes its output once (write-then-atomic-rename); a rerun
  *    skips completed stages by directory presence, so a kill at any point
  *    resumes without recomputation and publishes byte-identical tables
  *    (SURVEY.md §2.8: re-running whole bulks from bulksWithErrors,
  *    Harvester.java:1281-1432, upgraded to stage granularity).
  */
final class KgPipeline(cfg: PipelineConfig) {

  private val stagesRoot = s"${cfg.workDir}/stages"
  val supportTable = new TableCommitter(s"${cfg.workDir}/tables/support")
  val edgeTable = new TableCommitter(s"${cfg.workDir}/tables/edges")
  val nodeTable = new TableCommitter(s"${cfg.workDir}/tables/nodes")
  val docTable = new TableCommitter(s"${cfg.workDir}/tables/docs")
  val checkpoints = new CheckpointStore(s"${cfg.workDir}/checkpoints")

  /** Test hook: simulate a crash immediately after the named stage commits. */
  @volatile var failAfterStage: Option[String] = None

  /** Test hook: simulate a crash immediately after the named table publish
    * (pointer already flipped — the hardest resume point). */
  @volatile var failAfterPublish: Option[String] = None

  private def publishHook(name: String): Unit =
    if (failAfterPublish.contains(name))
      throw new RuntimeException(s"injected failure after publish $name")

  /** Write-once stage checkpoint: compute -> write tmp -> atomic rename.
    * Presence of the final dir == stage complete; a killed run can never
    * leave a half-readable checkpoint (K3 invariant). `afterWrite` runs on
    * the tmp dir between the parquet write and the rename, so sidecar files
    * (e.g. the observed watermark) commit atomically WITH the checkpoint. */
  private def stage(spark: SparkSession, runKey: String, name: String,
                    afterWrite: java.nio.file.Path => Unit = _ => ())
                   (compute: => DataFrame): DataFrame = {
    val dir = Paths.get(s"$stagesRoot/$runKey/$name")
    if (!Files.exists(dir)) {
      val tmp = Paths.get(s"$stagesRoot/$runKey/.$name.tmp")
      if (Files.exists(tmp)) { // stale partial write from a killed run
        Files.walk(tmp).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => Files.delete(f))
      }
      val df = compute
      withJobDesc(spark, s"stage:$name")(df.write.parquet(tmp.toString))
      // schema sidecar: the read-back below (and every resume) skips the
      // footer-based schema-inference job — a no-op sync is fixed-overhead
      // bound, and each inference is one extra Spark job
      graft.io.SparkIo.writeSchemaSidecar(df.schema, tmp)
      afterWrite(tmp)
      Files.createDirectories(dir.getParent)
      Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
      if (failAfterStage.contains(name))
        throw new RuntimeException(s"injected failure after stage $name")
    }
    // pre-sidecar checkpoints fall back to inference inside the helper
    graft.io.SparkIo.readParquetWithSidecar(spark, dir.toString)
  }

  /** Label the Spark jobs of `body` in the UI / listeners. */
  private def withJobDesc[T](spark: SparkSession, desc: String)(body: => T): T =
    graft.io.SparkIo.withJobDesc(spark, desc)(body)

  /** Bucket-set sidecar name (leading underscore — not data). */
  private val BucketSidecar = "_graft_buckets"

  /** Stage checkpoint whose BUCKET SET rides the stage write itself: the
    * distinct `bucketExpr` values are observed during the parquet write
    * (one CollectMetrics aggregate — zero extra Spark jobs) and committed
    * as a sidecar atomically WITH the checkpoint. A resumed run reads the
    * sidecar (still zero jobs). Only a pre-upgrade checkpoint without one
    * pays the old per-set collect job — this fusion is what cut the no-op
    * sync's fixed job floor (round-3 item: three driver-side bucket-set
    * collects, each a full scheduled job over delta-sized data). */
  private def stageWithBuckets(spark: SparkSession, runKey: String, name: String,
                               bucketExpr: org.apache.spark.sql.Column,
                               afterWrite: java.nio.file.Path => Unit = _ => ())
                              (compute: => DataFrame): (DataFrame, Set[Int]) = {
    var obs: Option[org.apache.spark.sql.Observation] = None
    val df = stage(spark, runKey, name, afterWrite = tmp => {
      val bs = obs.get.get("buckets").asInstanceOf[scala.collection.Seq[Any]]
        .map(_.toString.toInt)
      Files.writeString(tmp.resolve(BucketSidecar), bs.sorted.mkString(","))
      afterWrite(tmp)
    }) {
      val o = new org.apache.spark.sql.Observation(s"$runKey-$name-buckets")
      obs = Some(o)
      compute.observe(o, collect_set(bucketExpr).as("buckets"))
    }
    val f = Paths.get(s"$stagesRoot/$runKey/$name").resolve(BucketSidecar)
    val buckets: Set[Int] =
      if (Files.exists(f)) {
        val s = Files.readString(f).trim
        if (s.isEmpty) Set.empty else s.split(",").map(_.toInt).toSet
      } else // checkpoint predates the sidecar: one fallback collect job
        withJobDesc(spark, s"collect:$name-buckets")(
          df.select(bucketExpr.as("b")).distinct().collect())
          .map(_.getInt(0)).toSet
    (df, buckets)
  }

  /** Watermark sidecar name: leading underscore keeps parquet readers from
    * treating it as data (like _SUCCESS). */
  private val WmSidecar = "_graft_watermark"

  private def writeWmSidecar(tmp: java.nio.file.Path,
                             wm: Option[Timestamp]): Unit =
    Files.writeString(tmp.resolve(WmSidecar),
      wm.map(_.getTime.toString).getOrElse("none"))

  /** The watermark the ORIGINAL attempt of this stage observed; a resumed
    * run must replay it — recomputing from the post-crash source would
    * advance past data the stale checkpoint never extracted. Outer None =
    * no sidecar (checkpoint predates it). */
  private def readWmSidecar(runKey: String, name: String): Option[Option[Timestamp]] = {
    val f = Paths.get(s"$stagesRoot/$runKey/$name").resolve(WmSidecar)
    if (!Files.exists(f)) None
    else Files.readString(f).trim match {
      case "none" => Some(None)
      case ms => Some(Some(new Timestamp(ms.toLong)))
    }
  }

  /** Stable ordering + salted repartition (input contract: turn order must be
    * recovered from (conv_id, turn_idx), never from partition order). */
  def prepare(turns: Dataset[Turn]): Dataset[Turn] = {
    import turns.sparkSession.implicits._
    turns.repartition(cfg.numPartitions,
      col("conv_id"), pmod(hash(col("turn_idx")), lit(cfg.saltBuckets)))
      .sortWithinPartitions("conv_id", "turn_idx")
      .as[Turn]
  }

  /** Per-conversation triple supports: (conv_id, subj, pred, obj, lang,
    * weight) — the unit of idempotent incremental replacement. */
  /** K2: structurally-bad rows can never succeed on retry — divert them to
    * the quarantine table with a reason instead of failing the job.
    *
    * r6 restructure (guide §1.2, remove unnecessary passes): the validity
    * split, the run's event-time watermark (max ts) AND the bad-row count
    * all ride the consuming stage's own write via ONE Dataset.observe — the
    * former shape paid a dedicated full-source pass per run (the quarantine
    * write when enabled, a max(ts) aggregation otherwise; ~2 s of the 16 s
    * bench full run, and a per-sync scan). Bad rows are written only when
    * the observation reports any — a second, rare scan — and stay
    * runId-scoped + overwrite, so a crash-and-resume never double-appends
    * (K3 idempotence).
    * @return (valid rows, fire) — call fire() only AFTER the action that
    *         consumed the valid rows completed; it writes any quarantined
    *         rows and returns the watermark observed across ALL rows. */
  private def quarantined(spark: SparkSession, turns: Dataset[Turn],
                          runId: String): (Dataset[Turn], () => Option[Timestamp]) = {
    import spark.implicits._
    val obs = new org.apache.spark.sql.Observation()
    def wmOf(v: Any): Option[Timestamp] = v match {
      case null => None
      case t: Timestamp => Some(t)
      case i: java.time.Instant => Some(Timestamp.from(i))
      case l: java.time.LocalDateTime =>
        Some(new Timestamp(l.atZone(java.time.ZoneOffset.UTC)
          .toInstant.toEpochMilli))
      case other => sys.error(s"unexpected max_ts type: ${other.getClass}")
    }
    // EMPTY-RESULT corner: when the consuming stage's result prunes to an
    // empty relation, AQE's empty-relation propagation removes the whole
    // subtree INCLUDING the CollectMetrics node — the observation then
    // reports an empty map even though the action completed. fire() falls
    // back to explicit (input-sized — delta-sized on the sync path) passes
    // in that case: re-derive the watermark, and write the quarantine
    // defensively (an all-bad input is exactly the empty-good-plan case).
    if (!cfg.quarantineBadRows) {
      val observed = turns.toDF()
        .observe(obs, max(col("ts")).as("max_ts")).as[Turn]
      (observed, () => obs.get.get("max_ts") match {
        case Some(v) => wmOf(v)
        case None => maxEventTime(turns)
      })
    } else {
      val reason = Quarantine.reasonCol(Quarantine.turnChecks)
      val observed = turns.toDF().observe(obs,
        max(col("ts")).as("max_ts"),
        count(when(reason.isNotNull, lit(1))).as("n_bad"))
      val (good, bad) = Quarantine.split(observed, Quarantine.turnChecks)
      (good.as[Turn], () => {
        val m = obs.get
        if (m.get("n_bad").map(_.asInstanceOf[Long]).forall(_ > 0))
          withJobDesc(spark, "quarantine-write")(bad.write.mode("overwrite")
            .parquet(s"${cfg.workDir}/quarantine/run_id=$runId"))
        m.get("max_ts") match {
          case Some(v) => wmOf(v)
          case None => maxEventTime(turns)
        }
      })
    }
  }

  def computeSupports(spark: SparkSession, turns: Dataset[Turn],
                              catalog: Seq[CatalogEntry],
                              markers: Map[String, String]): DataFrame = {
    import spark.implicits._
    val identityCfg = cfg.proplist.isEmpty && cfg.normProp.isEmpty &&
      cfg.normObj.isEmpty && cfg.whiteMap.isEmpty && cfg.blackMap.isEmpty
    if (cfg.encodedShuffle && identityCfg && !cfg.useDistributedCanon &&
        !cfg.detectLanguage && !cfg.scoredLinking && !cfg.corefResolution)
      return computeSupportsEncoded(spark, turns, catalog, markers)
    // NOTE deliberately NOT prepare()d: extraction is per-turn, so it runs on
    // the input splits with no exchange at all — a full-input shuffle before
    // a narrow map stage is pure cost at 100 TB. The support aggregation
    // below shuffles by its own group keys with map-side partial aggregation,
    // which also absorbs hot-conversation skew (a hot conv's turns are
    // already spread across input splits). prepare() exists for operators
    // that genuinely need ordered per-conversation windows.
    // canonicalization composes into the kernel's broadcast dictionary
    // (code/string resolution at canonical granularity — no joins needed;
    // the CC result is catalog-sized by definition, so collecting the
    // distributed variant back to a broadcast map is bounded).
    // scoredLinking flips the shared-alias semantics: a surface form naming
    // several entities is AMBIGUITY to resolve per mention by context (the
    // TF-IDF/Jaccard linker), not identity to collapse — so canon is the
    // identity map and ambiguous aliases route through the linker below.
    val canon: Map[String, String] =
      if (cfg.scoredLinking) Map.empty
      else if (cfg.useDistributedCanon)
        canonicalMapDistributed(spark,
          catalog.toDF("entity_id", "alias", "pref_label", "rank"))
          .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      else graft.sources.TranscriptGen.components(catalog)
    val raw0 = Extractor.extract(turns, catalog, markers,
      emitContext = cfg.corefResolution, canon = canon,
      sentinelAmbiguous = cfg.scoredLinking).toDF()
    val raw1 =
      if (cfg.scoredLinking) resolveAmbiguousMentions(spark, raw0, turns, catalog)
      else raw0
    // coref runs AFTER scored linking so the cross-turn antecedent is the
    // contextually-resolved entity, not an ambiguity sentinel
    val raw =
      if (cfg.corefResolution) graft.extract.CorefResolver.resolve(raw1)
      else raw1
    val normalized = Extractor.normalize(raw, cfg)

    val grouped = normalized
      .groupBy("conv_id", "subj", "pred", "obj")
      .agg(count(lit(1)).as("weight"))
    // detectLanguage cost note: one extra narrow aggregation scan of `turns`
    // plus a post-aggregation join of the (already conv-grouped, far smaller
    // than raw turns) supports against the per-conversation langs. Default
    // off; the zero-extra-scan path is fusing the hit counts into the
    // extraction kernel — do that before enabling it at the 100 TB point.
    val stamped =
      if (!cfg.detectLanguage) grouped.withColumn("lang", lit(cfg.language))
      else grouped
        .join(convLanguages(turns), Seq("conv_id"), "left")
        .withColumn("lang", coalesce(col("lang"), lit(cfg.language)))
    stamped.select("conv_id", "subj", "pred", "obj", "lang", "weight")
  }

  /** Scored entity linking over the extraction output — shared with the
    * streaming ingest; see [[graft.link.AmbiguityResolver]] (the logic
    * lived here through round 3 and moved out verbatim for reuse). */
  private def resolveAmbiguousMentions(spark: SparkSession, raw: DataFrame,
                                       turns: Dataset[Turn],
                                       catalog: Seq[CatalogEntry]): DataFrame =
    graft.link.AmbiguityResolver.resolve(raw, turns, catalog)


  /** Conversation-level language detection: argmax function-word hit ratio
    * over `cfg.langProfiles` (ties break toward the lexicographically later
    * language — deterministic), falling back to the configured default when
    * no profile hits. Conversation granularity (not per-turn) because the
    * doc split is per (subject, lang) and a conversation is the subject
    * unit; a per-literal tag source (RDF ingestion) bypasses this entirely
    * via Triple.objLang. */
  private def convLanguages(turns: Dataset[Turn]): DataFrame = {
    // shared with the streaming ingest (LangDetect): the counts row is
    // associative over turns, which is what lets StreamingSync accumulate
    // the same detection across micro-batches bit-identically
    val profs = graft.text.LangDetect.sortedProfiles(cfg.langProfiles)
    require(profs.nonEmpty, "detectLanguage=true requires a non-empty langProfiles")
    graft.text.LangDetect.pick(
      graft.text.LangDetect.counts(turns.toDF(), profs), profs, cfg.language)
  }

  /** Identity-config fast path: dictionary-coded extraction + integer-key
    * aggregation, decoded after the exchange — same rows as the string path
    * (asserted by KgPipelineSpec), a fraction of the shuffle bytes. */
  private def computeSupportsEncoded(spark: SparkSession, turns: Dataset[Turn],
                                     catalog: Seq[CatalogEntry],
                                     markers: Map[String, String]): DataFrame = {
    val canon = graft.sources.TranscriptGen.components(catalog)
    val (enc, ents, preds) =
      Extractor.extractEncoded(turns, catalog, markers, canon)
    val entLit = typedlit(ents.toSeq)
    val predLit = typedlit(preds.toSeq)
    enc.groupBy("conv_id", "subjC", "predC", "objC")
      .agg(count(lit(1)).as("weight"))
      .select(
        col("conv_id"),
        when(col("subjC") === -1, concat(lit("urn:conv:"), col("conv_id")))
          .otherwise(element_at(entLit, col("subjC") + 1)).as("subj"),
        element_at(predLit, col("predC") + 1).as("pred"),
        element_at(entLit, col("objC") + 1).as("obj"),
        lit(cfg.language).as("lang"),
        col("weight"))
  }

  /** Entity -> canonical id over alias-sharing edges (multi-hop
    * generalization of normalizeObj, ESNormalizer.java:214-222).
    *
    * The catalog is by definition broadcast-sized (it ships to every
    * extraction task), so its components are computed with driver-side
    * union-find in O(|catalog|) — running the distributed CC here would add
    * seconds of fixed job-scheduling overhead per run for a graph of a few
    * thousand nodes and flatten the N->4N scaling curve. The iterative
    * large-star/small-star CC (graft.canon.ConnectedComponents) is the path
    * for graph-scale inputs: see `canonicalMapDistributed`. */
  def canonicalMap(spark: SparkSession, catalog: Seq[CatalogEntry]): DataFrame = {
    import spark.implicits._
    graft.sources.TranscriptGen.components(catalog).toSeq
      .toDF("id", "component")
  }

  /** Distributed variant for catalogs too large to hold on the driver:
    * alias-sharing edges + large-star/small-star CC. */
  def canonicalMapDistributed(spark: SparkSession, catalog: DataFrame): DataFrame = {
    val perAlias = catalog.select("alias", "entity_id").distinct()
    val aliasMin = perAlias.groupBy("alias").agg(min(col("entity_id")).as("root"))
    val edges = perAlias.join(aliasMin, "alias")
      .filter(col("entity_id") =!= col("root"))
      .select(col("entity_id").as("src"), col("root").as("dst"))
    val nodes = perAlias.select(col("entity_id").as("id")).distinct()
    ConnectedComponents.runWithNodes(nodes, edges)
      .select(col("id"), col("component"))
  }

  final case class RunResult(runId: String, edgesGen: String, nodesGen: String,
                             triples: Long)

  // ---- physical bucketing of the published tables: supports bucket on
  // conv_id (the sync replacement unit), edges on the full edge key, nodes
  // on entity_id — each table's bucket is derived from its own MERGE key, so
  // an incremental change maps to a deterministic, small set of buckets.
  //
  // Bucket-key choice at 10^12 turns: hash(conv_id) spreads UNIFORM change
  // evenly, so k ~ min(B, #changed conversations) — right when syncs touch
  // few conversations. When the change pattern is temporal (recent convs
  // change, old ones never), derive the bucket from a stable conv-level
  // time attribute instead (e.g. creation epoch-week) so changed convs
  // cluster into few buckets; the overwrite/carryover mechanism below is
  // key-agnostic — only this expression changes.
  private val B = cfg.syncBuckets
  // supports/nodes bucket on their own keys through the SAME verified
  // mapping (never a re-derived formula — see subjectBucket's contract)
  private def convBucket(c: org.apache.spark.sql.Column) = subjectBucket(c)
  // edges (and docs) bucket on hash(subj), not the full edge key: the merge
  // mechanism works with any stable key-derived bucket, and subject bucketing
  // additionally makes per-subject slices partition-prunable — the access
  // pattern of incremental doc rebuild ("give me all edges of these
  // subjects").
  // single source of truth: edgeBucket IS subjectBucket applied to subj
  private lazy val edgeBucket = subjectBucket(col("subj"))
  private val allBuckets: Set[Int] = (0 until B).toSet

  /** Bucket-count pin: the key-to-bucket mapping is baked into every
    * published generation, so running a sync with a different syncBuckets
    * than the tables were built with would replace rows in the wrong buckets
    * and silently carry stale copies forward. Pinned at first full run;
    * verified on every run. */
  private val bucketPin = Paths.get(s"${cfg.workDir}/_meta_pipeline/bucket_count")

  /** Pin or verify this workDir's bucket count. Public because EVERY writer
    * into the workDir's tables must pass it — KgMain's ingest-nt included,
    * not just runFull/runSync. */
  def pinOrVerifyBucketCount(): Unit = {
    if (Files.exists(bucketPin)) {
      val pinned = Files.readString(bucketPin).trim.toInt
      require(pinned == B,
        s"syncBuckets=$B but the published tables were built with $pinned " +
          "buckets — changing the bucket count requires a fresh workDir " +
          "(or a full rebuild into one)")
    } else {
      // atomic like every other commit point: a kill mid-write must not
      // leave a truncated pin that bricks the workDir
      Files.createDirectories(bucketPin.getParent)
      val tmp = bucketPin.resolveSibling(".bucket_count.tmp")
      Files.writeString(tmp, B.toString)
      Files.move(tmp, bucketPin, StandardCopyOption.ATOMIC_MOVE)
    }
    // the authoritative pin lives in each TABLE's own metadata (the mapping
    // is a property of the table, not of this workDir): a writer reaching a
    // table through any other path — StreamingSync, a different workDir —
    // trips the same check. The workDir pin above stays for early, clearer
    // failure before any table is touched.
    Seq(supportTable, edgeTable, nodeTable, docTable)
      .foreach { t =>
        t.pinOrVerify("bucket_count", B.toString)
        // the key EXPRESSION is part of the mapping contract exactly like
        // the count: a writer bucketing the same keys through a different
        // expression would replace rows in the wrong buckets. Adoption onto
        // a pre-pin table is guarded (TableCommitter.pinKeyExprOrVerify).
        t.pinKeyExprOrVerify(cfg.bucketKeyExpr,
          graft.config.PipelineConfig.DefaultBucketKeyExpr)
      }
  }

  /** Extraction-semantics pin: the flags that change what a support/edge
    * ROW means (coref resolution, scored linking, language detection, the
    * stamped language) are a property of the table CONTENTS, not of a
    * single run — an incremental sync merging rows extracted under
    * different flags than the standing generations would silently mix two
    * semantics within one table (the streaming path pins the same class of
    * flag in table metadata). Full runs rebuild every row, so they
    * legitimately (re)pin; syncs only replace slices, so they VERIFY.
    * Catalog/marker/normalization evolution is deliberately NOT pinned:
    * syncing against an updated model is the reference's normal operating
    * mode, and changed conversations re-extract whole under the new model.
    *
    * A full run pins at start, so a crashed full run can leave the pin
    * ahead of the published pointers — later syncs under the OLD flags then
    * refuse loudly until a full run completes. Loud-and-rare beats a silent
    * mix. */
  private val semanticsPin =
    Paths.get(s"${cfg.workDir}/_meta_pipeline/semantics")
  private def semanticsSig: String = cfg.semanticsSig
  private def pinSemantics(): Unit = {
    Files.createDirectories(semanticsPin.getParent)
    val tmp = semanticsPin.resolveSibling(".semantics.tmp")
    Files.writeString(tmp, semanticsSig)
    Files.move(tmp, semanticsPin, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
  private def verifySemantics(): Unit =
    if (Files.exists(semanticsPin)) {
      val pinned = Files.readString(semanticsPin).trim
      require(pinned == semanticsSig,
        s"sync flags ($semanticsSig) differ from the flags the standing " +
          s"tables were built with ($pinned) — an incremental sync would " +
          "mix row semantics within one table; run a FULL rebuild to " +
          "change them")
    } else if (supportTable.currentGeneration().isDefined) {
      // pre-pin-era workDir WITH published rows: what those rows mean is
      // unknowable (the flags predate the pin), so adopting the CURRENT
      // flags could bless a different semantics onto them and let this
      // sync merge mixed-meaning slices — the exact failure the pin
      // exists to prevent. Same adoption guard as pinKeyExprOrVerify.
      throw new IllegalStateException(
        "workDir has published tables but no semantics pin (built before " +
          "row semantics were pinned) — run a FULL rebuild to establish it")
    } else pinSemantics() // fresh workDir: adopt the current flags

  /** The subject-bucket expression of this pipeline's edge/doc tables —
    * external writers (KgMain ingest-nt) MUST use this, not a re-derived
    * copy: bucket-merge correctness requires every writer to agree
    * bit-for-bit on the key-to-bucket mapping. */
  def subjectBucket(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // keys here are always simple attribute references (conv_id / subj /
    // entity_id), whose Column rendering IS the identifier — the shared
    // mapping helper guards that, because a computed Column would not
    // round-trip through SQL text. Default "hash({k})" is the round-3
    // mapping bit-for-bit.
    graft.config.PipelineConfig.bucketCol(cfg.bucketKeyExpr, c.toString, B)
  }

  /** Every bucket id of this pipeline's tables (full-publish bucket set). */
  def allBucketIds: Set[Int] = allBuckets

  /** Full harvest (reference lifecycle §3.1): compute everything, publish
    * atomically, record watermark + metrics + lineage. */
  def runFull(spark: SparkSession, turns: Dataset[Turn],
              catalog: Seq[CatalogEntry], markers: Map[String, String],
              runId: String): RunResult = {
    pinOrVerifyBucketCount()
    pinSemantics() // full rebuilds every row: it defines the semantics
    // the quarantine split + watermark observation ride the stage write;
    // fire() runs in afterWrite, when the write (and thus the observation)
    // has completed
    var fire: () => Option[Timestamp] = () => None
    val supports = stage(spark, runId, "supports",
      afterWrite = tmp => writeWmSidecar(tmp, fire())) {
      val (good, f) = quarantined(spark, turns, runId)
      fire = f
      computeSupports(spark, good, catalog, markers)
    }
    // resumed run replays the checkpoint's own watermark; the live-source
    // fallback is only for checkpoints that predate the sidecar
    val wm = readWmSidecar(runId, "supports").getOrElse(maxEventTime(turns))
    checkpoints.writeLineageFromFooters(spark, runId, "supports",
      s"$stagesRoot/$runId/supports")

    supportTable.stagePartitioned(
      supports.withColumn("bucket", convBucket(col("conv_id"))), runId)
    supportTable.publishBuckets(runId, allBuckets)

    publishDerivedFull(spark, runId, supports, wm)
  }

  /** Event-time watermark: the max source timestamp processed — the next
    * sync run re-extracts only conversations with turns after it (the
    * reference uses harvest start time, Harvester.java:712; event time is
    * the Spark-idiomatic equivalent and is deterministic under replay).
    *
    * LATE-DATA CONTRACT: a turn whose ts is at or below the current
    * watermark when it ARRIVES is invisible to watermark syncs — same class
    * of gap as the reference's time-filtered sync (its start-time watermark
    * just trades it for reprocessing). Out-of-order sources need
    * `syncOldData` (full-set reconciliation) or a periodic full run. */
  private def maxEventTime(turns: Dataset[Turn]): Option[Timestamp] = {
    val r = turns.toDF().agg(max(col("ts"))).head()
    if (r.isNullAt(0)) None else Some(r.getTimestamp(0))
  }

  /** Deterministic sync run id: ONE logical sync per (successful-run count,
    * watermark) epoch. The incremental path's resume correctness hangs on
    * runId identity (stage checkpoints + idempotent publishes are
    * runId-scoped); a crashed sync retried under a fresh id would recompute
    * the delta from the already-mutated tables and silently lose the
    * edge/node update. The run COUNT is part of the id because the watermark
    * alone does not advance on an empty sync — a watermark-only id would
    * make the next data-bearing sync reuse the empty sync's checkpoints and
    * swallow its data. Use this (as KgMain does) unless the caller manages
    * its own stable ids. */
  def syncRunId(spark: SparkSession): String = {
    val (n, wm) = checkpoints.syncEpoch(spark, cfg.pipelineId)
    s"sync-n$n-wm-${wm.map(_.getTime).getOrElse(0L)}"
  }

  /** Incremental sync (reference lifecycle §3.2): watermark-filtered changed
    * set -> semi-join re-extract of changed conversations -> bucket-level
    * dynamic partition overwrite (only buckets containing touched
    * conversations are rewritten; the rest carry into the new generation by
    * hard link) -> delta-propagated edge/node updates. Per-sync work is
    * proportional to the CHANGED data, never to the table size — the
    * 100 TB nightly-sync requirement. */
  def runSync(spark: SparkSession, turns: Dataset[Turn],
              catalog: Seq[CatalogEntry], markers: Map[String, String],
              runId: String): RunResult = {
    import spark.implicits._
    pinOrVerifyBucketCount()
    verifySemantics() // syncs replace slices: they must match the table
    val wm = checkpoints.lastWatermark(spark, cfg.pipelineId)
      .getOrElse(new Timestamp(0L))

    // A8: distinct changed-conversation set since watermark. Stage-
    // CHECKPOINTED, not just materialized: the replayed sync_supports
    // checkpoint covers exactly the ORIGINAL changed set, so a resume must
    // replay the same set — recomputing it from the live source would
    // anti-join away rows of conversations that changed between the crash
    // and the retry while the replayed supports carry no replacement for
    // them (their turns stay above the replayed watermark and are picked up
    // whole by the NEXT sync). Also scans the full source once, not once per
    // consumer (semi-join restriction, replacement anti-join, bucket set).
    // the changed-conv BUCKET set rides this stage's write (sidecar) — no
    // separate collect job later
    val (changedConvs, changedConvBuckets) =
      stageWithBuckets(spark, runId, "changed_convs", convBucket(col("conv_id"))) {
        turns.toDF()
          .filter(col("ts") > lit(wm))
          .select("conv_id").distinct()
      }

    // the pre-sync snapshot, resolved ONCE (read() binds the physical gen
    // path eagerly; generations are immutable, so every consumer below —
    // vanished set, keep/replace, delta — reads the same snapshot even
    // after the publish flips the pointer)
    val curOpt = supportTable.read(spark)

    // J4: conversations that vanished from the source entirely (their
    // buckets must be rewritten too, or the delete would be lost).
    // Stage-checkpointed like changedConvs: the replayed edge_delta was
    // computed against the ORIGINAL vanished set, so a resume must
    // replace/delete exactly the same conversations — recomputing from
    // the post-crash source (or the already-published support table)
    // would diverge the support replacement from the edge/node delta.
    // Computed BEFORE the re-extract stages so a true no-op sync can exit
    // without scheduling any of them.
    val (vanished, vanishedBuckets) = curOpt match {
      case Some(cur) if cfg.syncOldData =>
        stageWithBuckets(spark, runId, "vanished_convs",
          convBucket(col("conv_id"))) {
          cur.select("conv_id").distinct()
            .join(turns.select("conv_id").distinct(),
              Seq("conv_id"), "left_anti")
        }
      case _ => (changedConvs.limit(0), Set.empty[Int])
    }

    // TRUE NO-OP fast path: nothing changed, nothing vanished (both known
    // from the stage sidecars — zero extra jobs) and every derived table is
    // healthy — record the run and stop. The empty re-extract, delta and
    // carryover-publish machinery would cost ~15 fixed Spark jobs to move
    // zero rows; a nightly no-op sync against a 100 TB table should be
    // metadata-only. The derived-table guards keep the self-heal paths
    // reachable: a table half-published by a crashed run still routes
    // through the full machinery below. Replay-stable: the checkpointed
    // changed set replays empty for this runId, so a crash-retry takes the
    // same path; the watermark cannot regress (None falls back to the last
    // recorded one inside finishRun).
    if (curOpt.isDefined && changedConvBuckets.isEmpty &&
        vanishedBuckets.isEmpty &&
        edgeTable.currentGeneration().isDefined &&
        nodeTable.currentGeneration().isDefined &&
        (!cfg.publishDocs || docTable.currentGeneration().isDefined)) {
      return finishRun(spark, runId, None,
        edgeTable.currentGeneration().get, nodeTable.currentGeneration().get,
        edgeTable.currentRecordCount(spark).getOrElse(0L))
    }

    // J3: re-extract only changed conversations (semi-join restriction)
    // any turn newer than the watermark belongs to a changed conversation by
    // construction, so max(ts) over changedTurns == max over the full source
    // whenever new data exists (and the fallback keeps the old watermark).
    // Stage-checkpointed: the quarantine split and the extraction each
    // consume these rows, and without the checkpoint each consumer re-scans
    // the FULL source behind the semi-join — three 100 TB scans per sync
    // instead of two (the changed-set scan + this one). The checkpoint is
    // delta-sized, and pinning it also hardens resume (a post-crash source
    // mutation can never leak into a replayed extraction).
    val changedTurns = stage(spark, runId, "changed_turns") {
      turns.join(changedConvs, Seq("conv_id"), "left_semi").toDF()
    }.as[Turn]
    var fire: () => Option[Timestamp] = () => None
    val newSupports = stage(spark, runId, "sync_supports",
      afterWrite = tmp => writeWmSidecar(tmp, fire())) {
      val (good, f) = quarantined(spark, changedTurns, runId)
      fire = f
      computeSupports(spark, good, catalog, markers)
    }
    // resumed run replays the checkpoint's own watermark — recomputing from
    // the CURRENT source would advance past turns that arrived between the
    // crash and the retry without ever extracting them
    val newWm = readWmSidecar(runId, "sync_supports")
      .getOrElse(maxEventTime(changedTurns))
    checkpoints.writeLineageFromFooters(spark, runId, "sync_supports",
      s"$stagesRoot/$runId/sync_supports")

    curOpt match {
      case None =>
        // first run arrived as a sync: equivalent to a full publish
        supportTable.stagePartitioned(
          newSupports.withColumn("bucket", convBucket(col("conv_id"))), runId)
        supportTable.publishBuckets(runId, allBuckets)
        publishDerivedFull(spark, runId,
          supportTable.read(spark).get.drop("bucket"), newWm)

      case Some(cur) =>
        val touched = changedConvs.unionByName(vanished).distinct()

        // the set of physical buckets to rewrite — at most B driver-side
        // ints, already known from the two stage sidecars (zero jobs)
        val changedBuckets = changedConvBuckets ++ vanishedBuckets
        val curChanged = cur
          .filter(col("bucket").isin(changedBuckets.toSeq: _*)) // partition-pruned
        val keep = curChanged
          .join(touched, Seq("conv_id"), "left_anti")
          .drop("bucket")

        // the edge/node delta needs the rows being REPLACED — bind it before
        // the publish below flips the pointer (read() resolved the physical
        // gen path eagerly, and generations are immutable, so this plan
        // stays valid afterwards)
        val keyCols = Seq("subj", "pred", "obj", "lang")
        val oldOfTouched = curChanged.join(touched, Seq("conv_id"), "left_semi")
        val delta = newSupports
          .select(keyCols.map(col) :+ col("weight").as("dw"): _*)
          .unionByName(oldOfTouched
            .select(keyCols.map(col) :+ (-col("weight")).as("dw"): _*))
          .groupBy(keyCols.map(col): _*)
          .agg(sum(col("dw")).as("dw"))
          .filter(col("dw") =!= 0)

        // checkpoint the delta BEFORE the support publish: it reads the
        // pre-publish snapshot, and a resume AFTER the publish must replay
        // the original delta — recomputing it from the mutated table would
        // yield an empty (or doubled) delta and silently lose the edge/node
        // update. The affected EDGE bucket set rides the same write.
        val (deltaCk, affectedEdgeBuckets) =
          stageWithBuckets(spark, runId, "edge_delta", edgeBucket)(delta)

        // dynamic-partition-overwrite: only the k changed buckets are
        // written; the other B-k carry over by hard link
        supportTable.stagePartitioned(
          keep.unionByName(newSupports)
            .withColumn("bucket", convBucket(col("conv_id"))), runId)
        supportTable.publishBuckets(runId, changedBuckets)
        publishHook("support")

        publishDerivedIncremental(spark, runId, deltaCk, affectedEdgeBuckets,
          newWm)
    }
  }

  /** Derive + publish full edge/node snapshots from the support table
    * (full-harvest path: every bucket is written). */
  private def publishDerivedFull(spark: SparkSession, runId: String,
                                 supports: DataFrame,
                                 newWatermark: Option[Timestamp]): RunResult = {
    // metrics ride the write itself (Dataset.observe) — no extra count job
    val obs = new org.apache.spark.sql.Observation()
    val edges = supports
      .groupBy("subj", "pred", "obj", "lang")
      .agg(sum(col("weight")).as("weight"))
      .observe(obs, count(lit(1)).as("n"), sum(col("weight")).as("total_weight"))
      .withColumn("bucket", edgeBucket)
    edgeTable.stagePartitioned(edges, runId)
    val edgesGen = edgeTable.publishBuckets(runId, allBuckets)
    publishHook("edges")

    // downstream tables derive from the just-published parquet snapshot —
    // re-using the logical `edges` plan would re-run the whole supports
    // aggregation once per derived table
    val publishedEdges = edgeTable.read(spark).get
    // nodes carry an edge-occurrence refcount so incremental syncs can
    // retire an entity exactly when its last edge disappears
    val nodes = publishedEdges
      .select(explode(array(col("subj"), col("obj"))).as("entity_id"))
      .groupBy("entity_id").agg(count(lit(1)).as("refs"))
      .withColumn("bucket", convBucket(col("entity_id")))
    nodeTable.stagePartitioned(nodes, runId)
    val nodesGen = nodeTable.publishBuckets(runId, allBuckets)

    // optional document sink: full path writes every doc bucket
    if (cfg.publishDocs) {
      val docs = graft.materialize.DocAssembler.assemble(
        publishedEdges.select("subj", "pred", "obj", "lang"), cfg)
      docTable.stagePartitioned(docs.withColumn("bucket", edgeBucket), runId)
      docTable.publishBuckets(runId, allBuckets)
    }

    finishRun(spark, runId, newWatermark, edgesGen, nodesGen,
      obs.get("n").asInstanceOf[Long],
      Seq(("edges", "total_weight", obs.get("total_weight").asInstanceOf[Long])))
  }

  /** Propagate a support-level weight delta into the edge and node tables,
    * rewriting only the buckets that contain affected keys. Edge weights are
    * additive counts, so `new = old + delta` is exact; a row retires when
    * its weight reaches 0, an entity when its edge refcount does. */
  private def publishDerivedIncremental(spark: SparkSession, runId: String,
                                        delta: DataFrame,
                                        affectedEdgeBuckets: Set[Int],
                                        newWatermark: Option[Timestamp]): RunResult = {
    val keyCols = Seq("subj", "pred", "obj", "lang")

    val (edgesGen, nodesGen) = edgeTable.read(spark) match {
      case None =>
        // the previous run crashed between the support publish and the edge
        // publish (e.g. a first-ever run that arrived as a sync): no edge
        // snapshot exists to merge a delta into — derive everything fully
        // from the published supports, which already contain the replayed
        // update
        return publishDerivedFull(spark, runId,
          supportTable.read(spark).get.drop("bucket"), newWatermark)
      case Some(curE) =>
        val curAffected = curE
          .filter(col("bucket").isin(affectedEdgeBuckets.toSeq: _*)) // pruned
          .drop("bucket")
        val updated = curAffected.join(delta, keyCols, "left")
          .select(keyCols.map(col) :+
            (col("weight") + coalesce(col("dw"), lit(0L))).as("weight"): _*)
          .filter(col("weight") > 0)
        val created = delta
          .join(curAffected.select(keyCols.map(col): _*), keyCols, "left_anti")
          .filter(col("dw") > 0)
          .select(keyCols.map(col) :+ col("dw").as("weight"): _*)

        // node refcount delta: +1 per created edge row, -1 per deleted one,
        // for both endpoints (consistent with the full-path refs definition).
        // Derived from the PRE-publish edge state, so it is checkpointed
        // BEFORE the edge publish — a resume after that publish would
        // otherwise recompute it against the already-updated edges and lose
        // the node update.
        val deleted = curAffected.join(delta, keyCols)
          .filter(col("weight") + col("dw") <= 0)
        // the affected NODE bucket set rides the stage write (sidecar)
        val (nodeDelta, affectedNodeBuckets) =
          stageWithBuckets(spark, runId, "node_delta",
            convBucket(col("entity_id"))) {
          created
            .select(explode(array(col("subj"), col("obj"))).as("entity_id"),
              lit(1L).as("dn"))
            .unionByName(deleted
              .select(explode(array(col("subj"), col("obj"))).as("entity_id"),
                lit(-1L).as("dn")))
            .groupBy("entity_id").agg(sum(col("dn")).as("dn"))
            .filter(col("dn") =!= 0)
        }

        edgeTable.stagePartitioned(
          updated.unionByName(created).withColumn("bucket", edgeBucket), runId)
        val eg = edgeTable.publishBuckets(runId, affectedEdgeBuckets)
        publishHook("edges")

        val ng = nodeTable.read(spark) match {
          case Some(curN) =>
            val curNA = curN
              .filter(col("bucket").isin(affectedNodeBuckets.toSeq: _*))
              .drop("bucket")
            val updatedN = curNA.join(nodeDelta, Seq("entity_id"), "left")
              .select(col("entity_id"),
                (col("refs") + coalesce(col("dn"), lit(0L))).as("refs"))
              .filter(col("refs") > 0)
            val createdN = nodeDelta.filter(col("dn") > 0)
              .join(curNA.select("entity_id"), Seq("entity_id"), "left_anti")
              .select(col("entity_id"), col("dn").as("refs"))
            nodeTable.stagePartitioned(
              updatedN.unionByName(createdN)
                .withColumn("bucket", convBucket(col("entity_id"))), runId)
            nodeTable.publishBuckets(runId, affectedNodeBuckets)
          case None =>
            // the previous run crashed between the edge and node publishes
            // (node table never bootstrapped): rebuild refcounts fully from
            // the just-published (delta-applied) edges — symmetric to the
            // missing-edge-table fallback above
            val rebuilt = edgeTable.read(spark).get
              .select(explode(array(col("subj"), col("obj"))).as("entity_id"))
              .groupBy("entity_id").agg(count(lit(1)).as("refs"))
              .withColumn("bucket", convBucket(col("entity_id")))
            nodeTable.stagePartitioned(rebuilt, runId)
            nodeTable.publishBuckets(runId, allBuckets)
        }
        (eg, ng)
    }

    val publishedEdges = edgeTable.read(spark).get
    // snapshot-level triple count straight from parquet footers — zero
    // Spark jobs (a metadata-only Spark count still schedules ~2)
    val nTriples = edgeTable.currentRecordCount(spark).getOrElse(0L)

    // optional document sink, incrementally: docs pivot per (subj, lang)
    // over all of a subject's edges, and edges are subject-bucketed — so the
    // delta's subjects map to exactly the affected edge/doc buckets. Rebuild
    // docs for affected subjects from their (pruned) edge slice, keep every
    // other doc in those buckets, carry untouched buckets by hard link.
    // uriDescription labels resolve against the slice's own object URIs
    // (bucket-pruned + semi-joined below — result-identical to a full-table
    // lookup because labels of URI u live under subject u); a label change
    // refreshes only docs of changed subjects — the reference's sync has the
    // same staleness (unchanged resources are not re-indexed,
    // Harvester.java:1199-1453) — unless `refreshReferencingDocs` opts into
    // the obj-side semi-join extension, which widens the affected-subject
    // set to every subject holding a changed subject as an object value.
    if (cfg.publishDocs) {
      docTable.read(spark) match {
        case Some(curD) =>
          val changedSubjects = delta.select("subj").distinct()
          val affectedSubjects =
            if (!cfg.refreshReferencingDocs) changedSubjects
            else changedSubjects.unionByName(
              // obj is not the bucket key, so this scans the edge table —
              // the documented cost of opting into label freshness
              publishedEdges
                .join(changedSubjects.withColumnRenamed("subj", "obj"),
                  Seq("obj"), "left_semi")
                .select("subj")).distinct()
              // materialized ONCE: three consumers below (bucket collect,
              // slice semi-join, kept anti-join) would otherwise re-run the
              // full obj-side edge scan each
              .localCheckpoint(true)
          // doc buckets follow the (possibly widened) affected-subject set —
          // a referencing subject can live outside the delta's edge buckets
          val docBuckets =
            if (!cfg.refreshReferencingDocs) affectedEdgeBuckets
            else withJobDesc(spark, "collect:doc-buckets")(
              affectedSubjects.select(subjectBucket(col("subj")).as("b"))
                .distinct().collect()).map(_.getInt(0)).toSet
          val slice = publishedEdges
            .filter(col("bucket").isin(docBuckets.toSeq: _*)) // pruned
            .join(affectedSubjects, Seq("subj"), "left_semi")
            .select("subj", "pred", "obj", "lang")
          // label lookup restricted to the slice's own object URIs BEFORE
          // aggregation: resolving against the whole edge table would make
          // per-sync doc cost O(table), not O(delta) — label subjects are
          // bucket-prunable (labels of URI u live under subject u, so only
          // the slice-obj buckets are read)
          // materialized once: consumed by the driver-side bucket collect
          // AND the labelSrc semi-join (two evaluations of the slice scan
          // otherwise)
          val sliceObjs = slice.select(col("obj").as("subj")).distinct()
            .localCheckpoint(true)
          val objBuckets = withJobDesc(spark, "collect:label-buckets")(
            sliceObjs.select(subjectBucket(col("subj")).as("b")).distinct()
              .collect()).map(_.getInt(0)).toSet
          val labelSrc = publishedEdges
            .filter(col("bucket").isin(objBuckets.toSeq: _*)) // pruned
            .join(sliceObjs, Seq("subj"), "left_semi")
            .select("subj", "pred", "obj", "lang")
          val rebuilt = graft.materialize.DocAssembler.assemble(
            slice, cfg, labelSource = Some(labelSrc))
          val kept = curD
            .filter(col("bucket").isin(docBuckets.toSeq: _*))
            .drop("bucket")
            .join(affectedSubjects, Seq("subj"), "left_anti")
          docTable.stagePartitioned(
            rebuilt.unionByName(kept).withColumn("bucket", edgeBucket), runId)
          docTable.publishBuckets(runId, docBuckets)
        case None =>
          // publishDocs enabled after a docs-less run: an incremental slice
          // would present only the changed subjects' docs as the whole
          // table — bootstrap with a full build instead
          val docs = graft.materialize.DocAssembler.assemble(
            publishedEdges.select("subj", "pred", "obj", "lang"), cfg)
          docTable.stagePartitioned(docs.withColumn("bucket", edgeBucket), runId)
          docTable.publishBuckets(runId, allBuckets)
      }
    }

    finishRun(spark, runId, newWatermark, edgesGen, nodesGen, nTriples)
  }

  private def finishRun(spark: SparkSession, runId: String,
                        newWatermark: Option[Timestamp],
                        edgesGen: String, nodesGen: String,
                        nTriples: Long,
                        extraMetrics: Seq[(String, String, Long)] = Seq.empty)
      : RunResult = {
    checkpoints.writeMetrics(spark, runId,
      ("edges", "published_triples", nTriples) +: extraMetrics)
    val wm = newWatermark
      .orElse(checkpoints.lastWatermark(spark, cfg.pipelineId))
      .getOrElse(new Timestamp(0L))
    checkpoints.writeWatermark(spark, cfg.pipelineId, runId, wm, "success")
    RunResult(runId, edgesGen, nodesGen, nTriples)
  }
}
