package graft.app

import org.apache.spark.sql.SparkSession

import graft.config.PipelineConfig
import graft.pipeline.KgPipeline
import graft.schema.{CatalogEntry, Turn}
import graft.sources.TranscriptGen

/** spark-submit entry point (SURVEY.md §7.1 module 9): full vs sync mode
  * dispatch (the reference's S4 query-type dispatch + indexAll/sync flag,
  * Harvester.java:571-575), reading the transcript table and the entity
  * catalog from parquet, publishing node/edge tables via the committer.
  *
  * Usage:
  *   KgMain full|sync <turnsParquetDir> <workDir> [catalogParquetDir]
  *   KgMain ingest-nt <ntDumpDir> <workDir>
  *   KgMain ingest-rdfxml <rdfXmlDumpDir> <workDir>
  *   KgMain ingest-stream <turnsParquetDir> <workDir> [catalogParquetDir]
  *   KgMain stats - <workDir>              per-predicate edge-table profile
  *   KgMain diff <genA,genB> <workDir>     edge delta between two generations
  *   KgMain query <file.rq|-> <workDir>    run SPARQL over the published
  *                                         graph ('-': GRAFT_SPARQL env, or
  *                                         the river config's query[] list)
  *   KgMain dedup-update <deltaParquet> <workDir>
  *                                         fold a (doc_id, text) delta into
  *                                         the incremental dedup index
  *                                         (O(delta) bucket rewrites;
  *                                         GRAFT_DEDUP_REMOVED=id,id,...
  *                                         retires deleted docs;
  *                                         GRAFT_RUN_ID pins idempotent
  *                                         crash-retry)
  *   KgMain dedup-candidates <deltaParquet> <workDir>
  *                                         duplicate candidates for a delta
  *                                         against the index (bucket-pruned
  *                                         lookup, never a corpus scan)
  *   KgMain multi <rivers.json> <baseWorkDir>
  *                                         concurrent multi-river harvests
  *                                         (the reference's pool across
  *                                         rivers, Indexer.java:78): each
  *                                         river {name, mode: full|sync,
  *                                         input, config?, catalog?} runs
  *                                         under <baseWorkDir>/<name> in its
  *                                         own FAIR scheduler pool;
  *                                         GRAFT_MAX_CONCURRENT caps
  *                                         parallelism (default 6, the
  *                                         reference's
  *                                         max_concurrent_harvests); one
  *                                         failed river never blocks the
  *                                         others (exit 1 after all ran)
  *
  * Pipeline knobs (env, all optional):
  *   GRAFT_CONFIG_JSON=<path>   river-config JSON (the reference's settings
  *                              blob shape — proplist/normProp/normObj/
  *                              normMissing/white/blackMap/language/
  *                              uriDescription/..., ConfigParsing.fromJson);
  *                              env flags below override its scale knobs
  *   GRAFT_DISTRIBUTED_CANON=1  large-star/small-star CC canonicalization
  *                              instead of driver union-find (graph-scale
  *                              catalogs)
  *   GRAFT_PUBLISH_DOCS=1       also publish the per-(subject, lang) doc table
  *   GRAFT_DETECT_LANGUAGE=1    per-conversation language detection
  *   GRAFT_SCORED_LINKING=1     contextual disambiguation of ambiguous aliases
  *   GRAFT_COREF=1              cross-turn coreference for subject-less markers
  *   GRAFT_REFRESH_REF_DOCS=1   label edits also refresh referencing docs
  *   GRAFT_SYNC_OLD_DATA=1      full-set vanished-conversation reconciliation
  *   GRAFT_SYNC_BUCKETS=<n>     physical bucket count (pinned at first run)
  *   GRAFT_STREAM_MAX_FILES=<n> (ingest-stream) cap files per micro-batch
  *
  * `ingest-nt` / `ingest-rdfxml` are the reference's dump-harvest lifecycle
  * (harvestFromDumps -> addModelToES -> publish, Harvester.java:1702-1730,
  * 1803-1905): RDF triples from N-Triples (line-parallel) or RDF/XML
  * (file-parallel — the serialization the reference itself reads) dumps are
  * assembled into per-(resource, language) docs — per-literal lang tags
  * routing via objLang — and published atomically.
  *
  * With no catalog dir, the built-in demo catalog is used (so the app is
  * drivable end-to-end on a bare fixture).
  */
object KgMain {
  /** Minimal RFC 8259 string escaping for data values interpolated into the
    * control-plane JSON lines (quotes, backslashes, control chars). */
  private[app] def jsonStr(s: String): String =
    s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    }.mkString("\"", "", "\"")

  /** The dedup-update / dedup-candidates mode body (separated from main()
    * so specs can drive the app path on a shared session): nightly CDC
    * deltas update / query the incremental dedup index in O(delta) bucket
    * rewrites — never a corpus re-scan (IncrementalDedupIndex scaladoc).
    * The delta parquet carries (doc_id, text); returns the mode's one-line
    * JSON report. */
  private[graft] def runDedup(spark: SparkSession, mode: String,
      deltaPath: String, workDir: String, removed: Seq[Long],
      runId: String, buckets: Int = 64): String = {
    val idx = new graft.dedup.IncrementalDedupIndex(workDir, buckets)
    val delta = spark.read.parquet(deltaPath)
    require(delta.columns.contains("doc_id") && delta.columns.contains("text"),
      s"dedup delta at $deltaPath needs (doc_id, text) columns, has " +
        delta.columns.mkString("(", ", ", ")"))
    if (mode == "dedup-update") {
      val (fpB, docB) = idx.update(spark, delta, runId, removed)
      s"""{"mode":"dedup-update","run_id":${jsonStr(runId)},""" +
        s""""touched_fp_buckets":${fpB.size},"touched_doc_buckets":${docB.size},""" +
        s""""removed":${removed.size}}"""
    } else {
      val out = idx.candidates(spark, delta)
      val outDir = s"$workDir/dedup_candidates"
      out.orderBy("doc_id", "dup_id").write.mode("overwrite").parquet(outDir)
      val n = spark.read.parquet(outDir).count()
      s"""{"mode":"dedup-candidates","rows":$n,"out":${jsonStr(outDir)}}"""
    }
  }

  private def envFlag(name: String): Boolean = sys.env.get(name) match {
    case None => false
    case Some("1") | Some("true") => true
    case Some("0") | Some("false") => false
    case Some(other) => // loud: a typo must not silently disable a feature
      sys.error(s"$name must be 0/1/true/false, got '$other'")
  }

  /** Process-level env knobs applied on top of a river config — ONE overlay
    * shared by the single-river and multi-river paths so they can never
    * diverge on what a flag means. */
  private[app] def envOverlay(baseCfg: PipelineConfig,
      workDir: String): PipelineConfig =
    baseCfg.copy(workDir = workDir,
      useDistributedCanon = envFlag("GRAFT_DISTRIBUTED_CANON"),
      publishDocs = envFlag("GRAFT_PUBLISH_DOCS"),
      detectLanguage = envFlag("GRAFT_DETECT_LANGUAGE"),
      scoredLinking = envFlag("GRAFT_SCORED_LINKING"),
      corefResolution = envFlag("GRAFT_COREF"),
      refreshReferencingDocs = envFlag("GRAFT_REFRESH_REF_DOCS"),
      syncOldData = baseCfg.syncOldData || envFlag("GRAFT_SYNC_OLD_DATA"),
      syncBuckets = sys.env.get("GRAFT_SYNC_BUCKETS").map(_.toInt)
        .getOrElse(baseCfg.syncBuckets))

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: KgMain full|sync|ingest-nt|ingest-rdfxml|ingest-stream " +
        "<inputDir> <workDir> [catalogParquetDir]")
    val Array(mode, turnsDir, workDir) = args.take(3)
    require(mode == "full" || mode == "sync" || mode == "ingest-nt" ||
        mode == "ingest-rdfxml" || mode == "ingest-stream" || mode == "stats" ||
        mode == "diff" || mode == "query" || mode == "dedup-update" ||
        mode == "dedup-candidates" || mode == "multi",
      s"unknown mode: $mode (stats ignores <inputDir>, pass '-'; " +
        "diff takes <genA,genB> in the <inputDir> position; " +
        "query takes a .rq file path — or '-' to use GRAFT_SPARQL / the " +
        "river config's query[] list; dedup-update/dedup-candidates take a " +
        "delta parquet of (doc_id, text) in the <inputDir> position; " +
        "multi takes a rivers.json in the <inputDir> position and a BASE " +
        "workDir — see MultiRiver)")

    val builder = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions) // SQL access to graft_dot etc.
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]"))
      .appName("graft-kg")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    // concurrent rivers share executors fairly (per-river scheduler pools,
    // MultiRiver scaladoc) instead of FIFO-starving each other
    val spark = (if (mode == "multi") builder.config("spark.scheduler.mode", "FAIR")
                 else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // data-shaping keys come from the river-config JSON when given (the
    // reference's settings blob, S7); scale knobs layer on top via env
    val baseCfg = sys.env.get("GRAFT_CONFIG_JSON")
      .map(p => graft.config.ConfigParsing.fromJson(
        java.nio.file.Files.readString(java.nio.file.Paths.get(p))))
      .getOrElse(PipelineConfig())
    val cfg = envOverlay(baseCfg, workDir)
    val pipeline = new KgPipeline(cfg)
    // sync runIds are watermark-derived so a crashed sync RETRIED FROM A NEW
    // PROCESS resumes the original run (stage checkpoints + idempotent
    // publishes are runId-scoped); full/ingest runs are self-contained and
    // take a fresh id
    val runId =
      if (mode == "sync") pipeline.syncRunId(spark)
      else s"$mode-${System.currentTimeMillis()}"

    if (mode == "ingest-nt" || mode == "ingest-rdfxml") {
      import org.apache.spark.sql.functions.col
      // every writer into the workDir's bucketed tables verifies the pin
      pipeline.pinOrVerifyBucketCount()
      // NT scans line-parallel; RDF/XML (the reference's own dump format,
      // Harvester.java:1711) is document-level so it scans file-parallel —
      // malformed files are skipped whole (the reference's RiotException
      // behavior) but SURFACED: each rejected file lands in the quarantine
      // area with its path + reason (the reference logs them,
      // Harvester.java:1723-1725; silent drops hide real data loss)
      var nRejects = 0L
      val triples =
        if (mode == "ingest-rdfxml") {
          // parsed once (persisted): the reject write and the doc build are
          // two actions over the same parse
          val parsed = graft.sources.RdfXmlSource.readParsed(spark, turnsDir)
            .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
          val rejects = parsed.filter(_.reason.isDefined)
            .map(p => (p.path, p.reason.get)).toDF("path", "reason")
          val obs = new org.apache.spark.sql.Observation()
          // runId-scoped overwrite, like the pipeline's row quarantine: a
          // crash-and-retry never double-appends; file-grain rejects get
          // their own dir (different schema than the turn quarantine)
          rejects.observe(obs, org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("n"))
            .write.mode("overwrite")
            .parquet(s"$workDir/quarantine_files/run_id=$runId")
          nRejects = obs.get("n").asInstanceOf[Long]
          parsed.flatMap(_.triples)
        }
        else graft.sources.NTriplesSource.read(spark, turnsDir)
      val docs = graft.materialize.DocAssembler.assemble(
        triples.toDF().select(col("subj"), col("pred"), col("obj"),
          col("objLang").as("lang")), cfg)
        .persist()
      // an all-malformed (or empty) dump yields zero docs: publishing an
      // empty generation would leave an unreadable table (no parquet files
      // to infer a schema from) — fail before the pointer moves
      val n = docs.count()
      require(n > 0,
        s"no valid triples parsed from $turnsDir — nothing published")
      // the pipeline's own bucket expression (never a re-derived copy):
      // a later full+sync over this workDir updates the table incrementally
      // only if every writer agrees bit-for-bit on key-to-bucket mapping
      pipeline.docTable.stagePartitioned(
        docs.withColumn("bucket", pipeline.subjectBucket(col("subj"))), runId)
      val gen = pipeline.docTable.publishBuckets(runId, pipeline.allBucketIds)
      docs.unpersist()
      println(s"""{"run_id":"$runId","mode":"$mode","docs_gen":"$gen","published_docs":$n,"rejected_files":$nRejects}""")
      spark.stop()
      return
    }

    if (mode == "diff") {
      // edge delta between two published generations — the ops answer to
      // "what did this sync actually change". Usage:
      //   KgMain diff <genA,genB> <workDir>
      // (inputDir position carries "genA,genB"). Scale shape: ONE full-outer
      // hash join on the edge key feeding one aggregate — a single pass over
      // each generation computes all three counts (vs. three separate
      // actions re-scanning both sides); no row data ever reaches the
      // driver.
      val gens = turnsDir.split(",").map(_.trim)
      require(gens.length == 2 && gens.forall(_.matches("gen-\\d+")),
        s"usage: KgMain diff <gen-N,gen-M> <workDir> — got '$turnsDir'")
      val Array(genA, genB) = gens
      def gen(g: String) = pipeline.edgeTable.readGeneration(spark, g).getOrElse(
        sys.error(s"generation $g does not exist under the edges table"))
      val (added, removed, reweighted) =
        graft.materialize.GraphStats.generationDelta(gen(genA), gen(genB))
      println(s"""{"table":"edges","from":"$genA","to":"$genB",""" +
        s""""added":$added,"removed":$removed,"reweighted":$reweighted}""")
      spark.stop()
      return
    }

    if (mode == "query") {
      // the reference's ACTUAL query surface: river configs carry SPARQL
      // (query[] + queryType, Indexer.java:350-463) that Harvester ships to
      // a remote triplestore (Harvester.java:1516-1659). Here the same text
      // compiles to a Catalyst plan over the PUBLISHED graph — the edge
      // table viewed as (s, p, o) — so a reference user's saved queries run
      // against the KG this engine just built, no triplestore in the loop.
      import org.apache.spark.sql.functions.col
      val queryTexts: Seq[String] =
        if (turnsDir != "-")
          Seq(java.nio.file.Files.readString(java.nio.file.Paths.get(turnsDir)))
        else sys.env.get("GRAFT_SPARQL").map(Seq(_)).getOrElse(cfg.queries)
      require(queryTexts.nonEmpty,
        "query mode needs a .rq file, GRAFT_SPARQL, or query[] in GRAFT_CONFIG_JSON")
      val edges = pipeline.edgeTable.read(spark).getOrElse(
        sys.error(s"no published edges table under $workDir — run full/sync first"))
      // `ol` exposes the edge's language stamp so lang()/langMatches()
      // filters work over the published graph. The stamp is the source
      // turn's language (config `language`, or detected under
      // detectLanguage) on EVERY edge — the reference's addLanguage
      // semantics exactly (ESNormalizer attaches `language` to the whole
      // document, not per-literal), so lang(?o) over a resource object
      // answers the turn's language, not RDF's no-tag-on-IRIs rule.
      val tr = edges.select(col("subj").as("s"), col("pred").as("p"),
        col("obj").as("o"), col("lang").as("ol"))
      // SERVICE federation against pre-materialized local graphs: each
      // configured IRI loads its dump once (an .nt file through the
      // line-parallel parser, else a parquet dir) and the compiler joins
      // SERVICE blocks against it instead of refusing
      val services: Map[String, org.apache.spark.sql.DataFrame] =
        cfg.serviceGraphs.map { case (iri, path) =>
          val df =
            if (path.endsWith(".nt"))
              // kind-preserving read: SERVICE frames carry the full
              // optional-column contract (ol + dt + tk), so lang()/
              // datatype()/isIRI-family filters inside SERVICE bodies
              // compile with exact spec semantics
              graft.sources.NTriplesSource.readWithKind(spark, path)
            else if (path.endsWith(".rdf") || path.endsWith(".xml"))
              graft.sources.RdfXmlSource.readWithKind(spark, path)
            else {
              val raw = spark.read.parquet(path)
              if (raw.columns.contains("subj"))
                raw.select(col("subj").as("s"), col("pred").as("p"),
                  col("obj").as("o"))
              else raw
            }
          iri -> df
        }
      queryTexts.zipWithIndex.foreach { case (q, i) =>
        val out = graft.sparql.SparqlCompiler.compile(q, tr, services)
        val outDir = s"$workDir/query_out/q$i"
        out.write.mode("overwrite").parquet(outDir)
        val n = spark.read.parquet(outDir).count()
        println(s"""{"mode":"query","query_idx":$i,"rows":$n,""" +
          s""""columns":${out.columns.map(jsonStr).mkString("[", ",", "]")},""" +
          s""""out":${jsonStr(outDir)}}""")
      }
      spark.stop()
      return
    }

    if (mode == "multi") {
      // concurrent multi-river harvests (the reference's pool-of-6 across
      // rivers, Indexer.java:78) — <inputDir> is the rivers.json spec,
      // <workDir> the BASE dir (each river publishes under <base>/<name>)
      val rivers = MultiRiver.parseSpec(
        java.nio.file.Files.readString(java.nio.file.Paths.get(turnsDir)),
        workDir)
      val maxConc = sys.env.get("GRAFT_MAX_CONCURRENT").map(_.toInt).getOrElse(6)
      val reports = MultiRiver.run(spark, rivers, maxConc, envOverlay)
      reports.foreach { r =>
        if (r.ok) println(r.detail)
        else println(s"""{"river":${jsonStr(r.name)},"mode":"${r.mode}",""" +
          s""""ok":false,"error":${jsonStr(r.detail)}}""")
      }
      val failed = reports.count(!_.ok)
      println(s"""{"mode":"multi","rivers":${reports.size},"failed":$failed,""" +
        s""""max_concurrent":$maxConc}""")
      spark.stop()
      // ops contract: any failed river fails the invocation AFTER all
      // rivers ran (the reference logs per-thread and keeps going; a batch
      // job needs the nonzero exit for its scheduler to alert on)
      if (failed > 0) sys.exit(1)
      return
    }

    if (mode == "dedup-update" || mode == "dedup-candidates") {
      println(runDedup(spark, mode, turnsDir, workDir,
        removed = sys.env.get("GRAFT_DEDUP_REMOVED").toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).map(_.toLong),
        // honor an explicit runId so a crashed update RETRIED FROM A NEW
        // PROCESS heals idempotently (same contract as sync)
        runId = sys.env.getOrElse("GRAFT_RUN_ID", runId),
        buckets = sys.env.get("GRAFT_DEDUP_BUCKETS").map(_.toInt).getOrElse(64)))
      spark.stop()
      return
    }

    if (mode == "stats") {
      // per-predicate schema profile of the PUBLISHED edge table (the
      // control-plane view that catches extraction drift between runs —
      // GraphStats scaladoc). Unlike KgAdmin this reads data, so it lives
      // in the Spark app, not the metadata-only CLI.
      val edges = pipeline.edgeTable.read(spark).getOrElse(
        sys.error(s"no published edges table under $workDir — run full/sync first"))
      // pred is DATA (it can arrive from a user-supplied catalog), so it is
      // JSON-escaped; every other field is an engine-generated number
      graft.materialize.GraphStats.profile(edges).collect().foreach { r =>
        println(s"""{"pred":${jsonStr(r.getString(0))},"n_edges":${r.getLong(1)},""" +
          s""""n_subj":${r.getLong(2)},"n_obj":${r.getLong(3)},""" +
          s""""max_out":${r.getLong(4)},"functional":${r.getInt(5)},""" +
          s""""total_weight":${r.getLong(6)}}""")
      }
      spark.stop()
      return
    }

    val catalog: Seq[CatalogEntry] =
      if (args.length >= 4)
        spark.read.parquet(args(3)).as[CatalogEntry].collect().toSeq
      else TranscriptGen.catalog(50)

    if (mode == "ingest-stream") {
      // Structured-Streaming front-end over the same transcript shape:
      // checkpointed source offsets replace the batch sync's watermark, each
      // micro-batch additively merges extracted supports into a bucketed
      // table, rewriting only the touched buckets (StreamingSync scaladoc).
      // The stream table gets its OWN committer (additive-merge lifecycle,
      // offset-driven) — never the batch pipeline's support table, whose
      // rows are replaced per-conversation under a watermark lifecycle;
      // mixing the two would double-count on the first overlapping run.
      // corefResolution wires the per-conversation antecedent state table
      // automatically; scoredLinking needs nothing extra; detectLanguage
      // wires the cumulative language-counter state table (and limits the
      // published surface to the supports table — see below).
      val tbl = new graft.io.TableCommitter(s"$workDir/tables/stream_supports")
      val state =
        if (cfg.corefResolution)
          Some(new graft.io.TableCommitter(
            s"$workDir/tables/stream_coref_state"))
        else None
      val langState =
        if (cfg.detectLanguage)
          Some(new graft.io.TableCommitter(
            s"$workDir/tables/stream_lang_state"))
        else None
      // the app publishes the full product surface like batch full does:
      // edges + nodes propagate additively per micro-batch (derivedStep) —
      // EXCEPT under detectLanguage, where a language flip would need
      // edge-weight retirement (StreamingSync refuses the combination);
      // the supports table remains the product, batch sync derives the rest
      val eTbl =
        if (cfg.detectLanguage) None
        else Some(new graft.io.TableCommitter(s"$workDir/tables/stream_edges"))
      val nTbl =
        if (cfg.detectLanguage) None
        else Some(new graft.io.TableCommitter(s"$workDir/tables/stream_nodes"))
      if (cfg.detectLanguage)
        // edges/nodes are the mode's implicit default surface: skipping
        // them must be SAID, not discovered from a missing directory
        System.err.println("[graft] detectLanguage=1: edge/node propagation " +
          "skipped on the streaming path (a language flip would need " +
          "edge-weight retirement); derive them with the batch sync")
      // publishDocs is an EXPLICIT user request — silently dropping it
      // would hide the divergence the streaming refusal exists to surface
      require(!(cfg.publishDocs && cfg.detectLanguage),
        "publishDocs + detectLanguage is not supported by ingest-stream " +
          "(docs derive from the edge slice, which detectLanguage cannot " +
          "propagate); publish docs with the batch sync")
      val dTbl =
        if (cfg.publishDocs)
          Some(new graft.io.TableCommitter(s"$workDir/tables/stream_docs"))
        else None
      val merged = graft.streaming.StreamingSync.ingestAvailableNow(
        spark, turnsDir, s"$workDir/stream_checkpoint",
        catalog, TranscriptGen.markerPreds, cfg, tbl,
        maxFilesPerBatch = sys.env.get("GRAFT_STREAM_MAX_FILES").map(_.toInt),
        corefStateTable = state, langStateTable = langState,
        edgeTable = eTbl, nodeTable = nTbl, docTable = dTbl)
      val gen = tbl.currentGeneration().getOrElse("<none>")
      // streaming publishes are keyed stream-<ckptId>-<batchId>, not by this
      // app invocation — report the LINEAGE id (what _meta/runs records
      // actually carry), not a minted run_id nothing on disk matches
      val lineage = tbl.currentGeneration("lastBatchCkpt").getOrElse("<none>")
      val edgesGen = eTbl.flatMap(_.currentGeneration()).getOrElse("<none>")
      println(s"""{"lineage":"$lineage","mode":"$mode","supports_gen":"$gen","edges_gen":"$edgesGen","merged_rows":$merged,"last_batch":${tbl.currentGeneration("lastBatch").getOrElse("-1")}}""")
      spark.stop()
      return
    }

    val turns = spark.read.parquet(turnsDir).as[Turn]

    val result =
      if (mode == "full")
        pipeline.runFull(spark, turns, catalog, TranscriptGen.markerPreds, runId)
      else
        pipeline.runSync(spark, turns, catalog, TranscriptGen.markerPreds, runId)

    println(s"""{"run_id":"${result.runId}","mode":"$mode","edges_gen":"${result.edgesGen}","nodes_gen":"${result.nodesGen}","published_triples":${result.triples}}""")
    spark.stop()
  }
}
