package graft

import java.util.Locale

import org.apache.spark.sql.SparkSession

import graft.config.PipelineConfig
import graft.pipeline.KgPipeline
import graft.schema.Turn
import graft.sources.TranscriptGen

/** Per-round benchmark: (1) every registered query at SPARK_GRAFT_SF_DIR;
  * (2) the KG extraction pipeline on a deterministic synthetic transcript
  * corpus at multiple parallelism levels — local[1] vs local[4] and
  * local[8] vs local[32] (two independent N->4N pairs) on identical parquet
  * input, each in a fresh child JVM — reporting triples/sec at each plus
  * both N->4N scaling efficiencies (the sandbox evidence for the north
  * rule's two-cluster-size criterion; see BASELINE.md targets).
  *
  * Prints ONE JSON line: {"metric","value","unit","queries","sf","kg"}.
  */
object Bench {

  private def fmt(d: Double): String = "%.4f".formatLocal(Locale.ROOT, d)

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // the bench corpus is many small parquet files: with the default 128MB
      // maxPartitionBytes the scan collapses to ~6 input partitions and no
      // core count beyond ~6 helps; size splits so the map stage can fan out
      // (on a real cluster with 128MB+ row groups the default is right)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      // shuffle spill on tmpfs: /tmp is disk-backed here and random flush
      // stalls add 3-5x noise to per-pass timings
      .config("spark.local.dir", {
        val d = java.nio.file.Paths.get("/dev/shm/spark-local")
        java.nio.file.Files.createDirectories(d)
        d.toString
      })
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Run ScalingBench in a fresh child JVM and parse its JSON line. */
  private def scalingChild(cores: Int, turnsDir: String): (Double, Long, Long) = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    // Spark-4-on-JDK17 module opens (same list as build.sbt / spark-submit)
    val jvmArgs = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED")) ++ Seq(
      "-Xmx8g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC")
    val cmd = Seq(javaBin) ++ jvmArgs ++ Seq(
      "-cp", System.getProperty("java.class.path"),
      "graft.ScalingBench", cores.toString, turnsDir,
      if (cores <= 2) "2" else if (cores >= 16) "4" else "3")
    val out = new StringBuilder
    // child stderr inherits the parent's (Spark logs are chatty: an unread
    // stderr pipe would fill and deadlock the child mid-write)
    val proc = new ProcessBuilder(cmd: _*)
      .redirectError(ProcessBuilder.Redirect.INHERIT).start()
    val rdr = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    var line = rdr.readLine()
    while (line != null) { out.append(line).append('\n'); line = rdr.readLine() }
    proc.waitFor()
    val json = out.toString.linesIterator
      .find(_.contains("\"cores\"")).getOrElse(
        sys.error(s"scaling child ($cores cores) produced no result: $out"))
    def field(k: String): String =
      json.split(s""""$k":""")(1).takeWhile(c => c != ',' && c != '}')
    (field("sec").toDouble, field("turns").toLong, field("triples").toLong)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // ---- part 1: registered queries at the round's scale factor
    val spark1 = session(cpus)
    // warm the session (codegen, parquet reader init, file listing) so the
    // alphabetically-first query does not absorb one-time costs
    Seq("lineitem", "events", "documents", "embeddings", "orders", "customer",
      "supplier", "part", "nation", "region").foreach { t =>
      Tables(spark1, sfDir, t).limit(1).count()
    }
    // optional focus knobs for local iteration (driver runs use defaults):
    // SPARK_GRAFT_ONLY=q1,q2 times just those queries; SPARK_GRAFT_SKIP_KG=1
    // skips the scaling section
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val skipKg = sys.env.get("SPARK_GRAFT_SKIP_KG").contains("1")
    val skipScaling = skipKg ||
      sys.env.get("SPARK_GRAFT_SKIP_SCALING").contains("1")

    // failed queries are recorded explicitly (time -1 + errors entry), never
    // silently as a fast run. Each query is timed min-of-N (default 2,
    // unconditional) so single-sample scheduler jitter (±25% observed at
    // ~1 s query times) cannot masquerade as regression or improvement.
    val querySamples = sys.env.getOrElse("SPARK_GRAFT_QUERY_SAMPLES", "2").toInt
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      try {
        val times = (1 to querySamples).map { _ =>
          val t0 = System.nanoTime()
          fn(spark1, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        name -> times.min
      } catch {
        case e: Throwable =>
          errors(name) = e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("").take(200).replaceAll("[\"\\\\\n\r\t]", " ")
          name -> -1.0
      }
    }
    // ---- part 2: generate the KG bench corpus once (identical input for
    // both parallelism levels)
    // ~9.5M turns: large enough that compute dominates the fixed per-job
    // overheads at every measured parallelism level
    val nConv = sys.env.getOrElse("SPARK_GRAFT_KG_CONVS", "1000000").toInt
    val turnsDir = s"/tmp/graft-bench-turns-$nConv"
    if (!skipScaling && !java.nio.file.Files.exists(java.nio.file.Paths.get(turnsDir))) {
      TranscriptGen.generateDistributed(spark1, nConv, partitions = 64)
        .write.mode("overwrite").parquet(turnsDir)
    }
    spark1.stop()

    // ---- part 3: same job at N and 4N cores on identical input, each level
    // in a FRESH child JVM (same-JVM back-to-back sessions contaminate each
    // other via JIT/GC/heap state — measured up to 40% skew).
    // Two N->4N evidence pairs: local[1] -> local[4] (bus unsaturated —
    // isolates framework scaling; on a real cluster every executor brings
    // its own memory bandwidth, GC capacity and shuffle disks) and
    // local[8] -> local[32] (the literal 8-vs-32-core pair the round-4
    // instructions suggest; it includes the single-socket bandwidth
    // ceiling a real 4N-executor cluster would not share). local[32] also
    // gives peak single-box throughput; 4->32 is reported for transparency.
    // best-sustained-time = min over a FIXED number of samples per level,
    // taken unconditionally (a one-sided retry that only fires on a bad
    // ratio could only ever improve the reported efficiency)
    val samplesPerLevel = sys.env.getOrElse("SPARK_GRAFT_BENCH_SAMPLES", "2").toInt
    val (t1, t4, t8, t32, nTurns, nTriples) =
      if (skipScaling) (1.0, 1.0, 1.0, 1.0, 0L, 0L)
      else {
        val (t1a, turns, triples) = scalingChild(1, turnsDir)
        val m1 = (Seq(t1a) ++
          (2 to samplesPerLevel).map(_ => scalingChild(1, turnsDir)._1)).min
        val m4 = (1 to samplesPerLevel).map(_ => scalingChild(4, turnsDir)._1).min
        val m8 = (1 to samplesPerLevel).map(_ => scalingChild(8, turnsDir)._1).min
        val m32 = (1 to samplesPerLevel).map(_ => scalingChild(32, turnsDir)._1).min
        (m1, m4, m8, m32, turns, triples)
      }

    // two independent N->4N evidence pairs: 1->4 (bus unsaturated, isolates
    // framework scaling) and 8->32 (the high end, includes the single-box
    // bandwidth ceiling a real 4N-executor cluster would not share)
    val eff14 = (t1 / t4) / 4.0
    val eff832 = (t8 / t32) / 4.0
    val eff432 = (t4 / t32) / 8.0

    // ---- part 4: incremental-sync proportionality — a sync touching a
    // handful of conversations must cost a fraction of the full run and
    // physically rewrite only the buckets containing them (the 100 TB
    // nightly-sync criterion). Bytes accounted by inode diff between the
    // support table's generations: hard-linked carryover files are free.
    val (syncJson, streamJson, ddJson) = if (skipKg) ("{}", "{}", "{}") else {
      import org.apache.spark.sql.functions._
      val spark2 = session(cpus)
      import spark2.implicits._
      val nConvSync = sys.env.getOrElse("SPARK_GRAFT_SYNC_CONVS", "200000").toInt
      val full = TranscriptGen
        .generateDistributed(spark2, nConvSync, partitions = 64).toDF()
      val convNum = substring(col("conv_id"), 6, 6).cast("int")
      val heldBack = (convNum % (nConvSync / 5) === 3) && (col("turn_idx") > 3)
      val base = s"/tmp/graft-sync-bench-$nConvSync"
      val t0Dir = s"$base/t0"; val t1Dir = s"$base/t1"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(t0Dir))) {
        full.filter(!heldBack).write.mode("overwrite").parquet(t0Dir)
        // appended turns arrive with later event time than everything in t0
        spark2.read.parquet(t0Dir)
          .unionByName(full.filter(heldBack)
            .withColumn("ts", col("ts") + expr("INTERVAL 30 DAYS")))
          .write.mode("overwrite").parquet(t1Dir)
      }
      val wd = s"/tmp/graft-sync-work-${System.nanoTime()}"
      val p = new KgPipeline(PipelineConfig(workDir = wd, syncBuckets = 64))
      val cat = TranscriptGen.catalog(50)
      val tF0 = System.nanoTime()
      p.runFull(spark2, spark2.read.parquet(t0Dir).as[Turn], cat,
        TranscriptGen.markerPreds, "bench-full")
      val fullSec = (System.nanoTime() - tF0) / 1e9
      val gen0 = java.nio.file.Paths.get(p.supportTable.currentPath().get)
      val tS0 = System.nanoTime()
      p.runSync(spark2, spark2.read.parquet(t1Dir).as[Turn], cat,
        TranscriptGen.markerPreds, "bench-sync")
      val syncSec = (System.nanoTime() - tS0) / 1e9
      val gen1 = java.nio.file.Paths.get(p.supportTable.currentPath().get)
      // the no-op floor: a sync with NOTHING changed takes the metadata-only
      // fast path (empty changed/vanished sets known from the stage
      // sidecars) — the nightly-cron-against-an-unchanged-100TB-table cost
      val tN0 = System.nanoTime()
      p.runSync(spark2, spark2.read.parquet(t1Dir).as[Turn], cat,
        TranscriptGen.markerPreds, "bench-sync-noop")
      val noopSec = (System.nanoTime() - tN0) / 1e9
      def files(g: java.nio.file.Path) = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(g).iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
      }
      def inode(f: java.nio.file.Path) =
        java.nio.file.Files.getAttribute(f, "unix:ino").asInstanceOf[Long]
      val oldInodes = files(gen0).map(inode).toSet
      val newFiles = files(gen1)
      val fresh = newFiles.filterNot(f => oldInodes.contains(inode(f)))
      val freshBytes = fresh.map(java.nio.file.Files.size(_)).sum
      val totalBytes = newFiles.map(java.nio.file.Files.size(_)).sum
      val rewrittenBuckets = fresh.map(_.getParent.getFileName.toString).distinct.size
      val totalBuckets = newFiles.map(_.getParent.getFileName.toString).distinct.size
      val syncStr =
        s"""{"convs":$nConvSync,"changed_convs":5,"full_sec":${fmt(fullSec)},""" +
        s""""sync_sec":${fmt(syncSec)},"speedup":${fmt(fullSec / syncSec)},""" +
        s""""noop_sec":${fmt(noopSec)},""" +
        s""""rewritten_buckets":$rewrittenBuckets,"total_buckets":$totalBuckets,""" +
        s""""fresh_bytes":$freshBytes,"total_bytes":$totalBytes}"""

      // ---- part 5: STREAMING ingest proportionality — a micro-batch
      // appending turns of 5 conversations to an already-ingested corpus must
      // rewrite only their buckets (same inode accounting as the sync check)
      import java.nio.file.{Files => F, Paths}
      val sBase = Paths.get(s"/tmp/graft-stream-bench-${System.nanoTime()}")
      val sIn = sBase.resolve("in"); F.createDirectories(sIn)
      files(Paths.get(t0Dir)).foreach(f =>
        F.createLink(sIn.resolve(f.getFileName), f))
      val sTbl = new graft.io.TableCommitter(sBase.resolve("tbl").toString)
      val sCkpt = sBase.resolve("ckpt").toString
      val sCfg = PipelineConfig(syncBuckets = 64)
      val cat2 = TranscriptGen.catalog(50)
      val tB0 = System.nanoTime()
      graft.streaming.StreamingSync.ingestAvailableNow(spark2, sIn.toString,
        sCkpt, cat2, TranscriptGen.markerPreds, sCfg, sTbl)
      val streamFullSec = (System.nanoTime() - tB0) / 1e9
      val sGen0 = Paths.get(sTbl.currentPath().get)
      full.filter(heldBack)
        .withColumn("ts", col("ts") + expr("INTERVAL 30 DAYS"))
        .coalesce(1).write.mode("append").parquet(sIn.toString)
      val tB1 = System.nanoTime()
      graft.streaming.StreamingSync.ingestAvailableNow(spark2, sIn.toString,
        sCkpt, cat2, TranscriptGen.markerPreds, sCfg, sTbl)
      val streamDeltaSec = (System.nanoTime() - tB1) / 1e9
      val sGen1 = Paths.get(sTbl.currentPath().get)
      val sOldInodes = files(sGen0).map(inode).toSet
      val sNewFiles = files(sGen1)
      val sFresh = sNewFiles.filterNot(f => sOldInodes.contains(inode(f)))
      val streamStr =
        s"""{"convs":$nConvSync,"batch_convs":5,"full_sec":${fmt(streamFullSec)},""" +
        s""""delta_sec":${fmt(streamDeltaSec)},""" +
        s""""speedup":${fmt(streamFullSec / streamDeltaSec)},""" +
        s""""rewritten_buckets":${sFresh.map(_.getParent.getFileName.toString).distinct.size},""" +
        s""""total_buckets":${sNewFiles.map(_.getParent.getFileName.toString).distinct.size},""" +
        s""""fresh_bytes":${sFresh.map(F.size(_)).sum},""" +
        s""""total_bytes":${sNewFiles.map(F.size(_)).sum}}"""

      // ---- part 5b: incremental dedup-index proportionality — updating the
      // corpus fingerprint index for a handful of changed documents must
      // rewrite only the fp/doc buckets the delta touches (same inode
      // accounting as sync/stream). Documents = one per conversation of the
      // same t0 corpus.
      val docs = spark2.read.parquet(t0Dir)
        .groupBy(col("conv_id"))
        .agg(concat_ws(" ", collect_list(col("text"))).as("text"))
        .select(substring(col("conv_id"), 6, 10).cast("long").as("doc_id"),
          col("text"))
      val ddWork = s"/tmp/graft-ddidx-bench-${System.nanoTime()}"
      val ddIdx = new graft.dedup.IncrementalDedupIndex(ddWork, buckets = 64)
      val tD0 = System.nanoTime()
      ddIdx.update(spark2, docs, "dd-full")
      val ddFullSec = (System.nanoTime() - tD0) / 1e9
      val ddRoot = Paths.get(ddWork, "dedup_fp_index")
      def lastGen(root: java.nio.file.Path) = {
        import scala.jdk.CollectionConverters._
        F.list(root).iterator().asScala
          .filter(_.getFileName.toString.startsWith("gen-"))
          .toSeq.maxBy(_.getFileName.toString.stripPrefix("gen-").toLong)
      }
      val dGen0 = lastGen(ddRoot)
      val delta = docs.filter(col("doc_id") < 5)
        .select(col("doc_id"), concat(lit("edited "), col("text")).as("text"))
      val tD1 = System.nanoTime()
      val (ddFpB, _) = ddIdx.update(spark2, delta, "dd-delta")
      val ddDeltaSec = (System.nanoTime() - tD1) / 1e9
      val tD2 = System.nanoTime()
      val ddCand = ddIdx.candidates(spark2, delta).count()
      val ddLookupSec = (System.nanoTime() - tD2) / 1e9
      val dGen1 = lastGen(ddRoot)
      val dOldInodes = files(dGen0).map(inode).toSet
      val dNewFiles = files(dGen1)
      val dFresh = dNewFiles.filterNot(f => dOldInodes.contains(inode(f)))
      val ddStr =
        s"""{"docs":${docs.count()},"delta_docs":5,""" +
        s""""full_sec":${fmt(ddFullSec)},"delta_sec":${fmt(ddDeltaSec)},""" +
        s""""lookup_sec":${fmt(ddLookupSec)},"candidates":$ddCand,""" +
        s""""rewritten_buckets":${ddFpB.size},""" +
        s""""total_buckets":${dNewFiles.map(_.getParent.getFileName.toString).distinct.size},""" +
        s""""fresh_bytes":${dFresh.map(F.size(_)).sum},""" +
        s""""total_bytes":${dNewFiles.map(F.size(_)).sum}}"""
      spark2.stop()
      (syncStr, streamStr, ddStr)
    }

    // ---- part 6: dump-ingest throughput — the SAME logical triples read
    // through NTriplesSource (line-parallel text) and RdfXmlSource
    // (file-parallel documents, 64 files). Quantifies the documented
    // parallelism-contract difference between the two RDF serializations.
    val ingestJson = if (skipKg) "{}" else {
      import org.apache.spark.sql.functions._
      import graft.schema.Triple
      import graft.sources.{NTriplesSource, RdfXmlSource}
      val spark3 = session(cpus)
      import spark3.implicits._
      val nConvSync = sys.env.getOrElse("SPARK_GRAFT_SYNC_CONVS", "200000").toInt
      val t0Dir = s"/tmp/graft-sync-bench-$nConvSync/t0"
      val ntDir = s"/tmp/graft-ingest-bench-$nConvSync/nt"
      val xmlDir = s"/tmp/graft-ingest-bench-$nConvSync/rdfxml"
      val trip = spark3.read.parquet(t0Dir).select(
        concat(lit("urn:conv:"), col("conv_id")).as("subj"),
        concat(lit("urn:p:turn"), col("turn_idx").cast("string")).as("pred"),
        col("text").as("obj"))
      // guard on the LAST write's _SUCCESS marker: a crash between or during
      // the two writes would otherwise wedge every later run on a
      // half-generated corpus (both writes are mode=overwrite, so
      // regeneration heals any partial state)
      if (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(xmlDir, "_SUCCESS"))) {
        trip.as[(String, String, String)]
          .map { case (s0, p0, o0) => NTriplesSource.render(Triple(s0, p0, o0, "en", "")) }
          .repartition(64).write.mode("overwrite").text(ntDir)
        // one COMPLETE single-line RDF/XML document per partition -> 64
        // one-document files, the file-parallel scan contract; rendered by
        // the real exporter (round-trip property-tested)
        trip.as[(String, String, String)].repartition(64)
          .mapPartitions { it =>
            Iterator(RdfXmlSource.render(
              it.map { case (s0, p0, o0) => Triple(s0, p0, o0, "en", "") }.toSeq))
          }.write.mode("overwrite").text(xmlDir)
      }
      def time2(body: => Long): (Double, Long) = {
        val runs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val n = body
          ((System.nanoTime() - t0) / 1e9, n)
        }
        (runs.map(_._1).min, runs.head._2)
      }
      val (ntSec, ntN) = time2(NTriplesSource.read(spark3, ntDir).count())
      val (xmlSec, xmlN) =
        time2(RdfXmlSource.read(spark3, s"$xmlDir/part-*").count())
      require(ntN == xmlN, s"ingest parity broken: NT=$ntN RDF/XML=$xmlN")
      spark3.stop()
      s"""{"triples":$ntN,"nt_sec":${fmt(ntSec)},"rdfxml_sec":${fmt(xmlSec)},""" +
        s""""nt_triples_per_sec":${fmt(ntN / ntSec)},""" +
        s""""rdfxml_triples_per_sec":${fmt(xmlN / xmlSec)}}"""
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val kg = s"""{"turns":$nTurns,"triples":$nTriples,""" +
      s""""sec_local1":${fmt(t1)},"sec_local4":${fmt(t4)},""" +
      s""""sec_local8":${fmt(t8)},"sec_local32":${fmt(t32)},""" +
      s""""triples_per_sec_local1":${fmt(nTriples / t1)},""" +
      s""""triples_per_sec_local4":${fmt(nTriples / t4)},""" +
      s""""triples_per_sec_local8":${fmt(nTriples / t8)},""" +
      s""""triples_per_sec_local32":${fmt(nTriples / t32)},""" +
      s""""turns_per_sec_local32":${fmt(nTurns / t32)},""" +
      s""""scaling_efficiency_1_to_4":${fmt(eff14)},""" +
      s""""scaling_efficiency_8_to_32":${fmt(eff832)},""" +
      s""""scaling_efficiency_4_to_32":${fmt(eff432)}}"""
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir","kg":$kg,"sync":$syncJson,"stream":$streamJson,"dedup_index":$ddJson,"ingest":$ingestJson}""")
  }
}
