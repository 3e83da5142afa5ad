package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot table with atomic publish — the Iceberg-snapshot-commit pattern
  * emulated over parquet + a manifest pointer (no Iceberg runtime in
  * /opt/spark/jars), which is exactly the reference's `@temp-` staging index
  * + write-block + clone + swap flow (Harvester.java:793-868, SURVEY.md K3)
  * made file-based:
  *
  *   root/_meta/current         <- one-line pointer file, atomically replaced
  *   root/gen-<n>/              <- immutable published snapshots
  *   root/_staging/<runId>/     <- in-flight writes; never visible to readers
  *
  * Readers resolve the pointer first, so a crashed run leaves only dead
  * staging files (rollback = delete staging, K5; the pointer never moved).
  * Blue/green aliases (K6, Indexer.switchAliases) are additional named
  * pointer files over the same generations.
  *
  * At cluster scale the pointer flip maps to an Iceberg snapshot commit /
  * metastore pointer swap; the rest of the layout is unchanged.
  */
final class TableCommitter(rootDir: String) {
  private val root = Paths.get(rootDir)
  private val meta = root.resolve("_meta")
  private val staging = root.resolve("_staging")

  private def pointerFile(alias: String): Path = meta.resolve(alias)

  def currentGeneration(alias: String = "current"): Option[String] = {
    val p = pointerFile(alias)
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim)
    else None
  }

  def currentPath(alias: String = "current"): Option[String] =
    currentGeneration(alias).map(g => root.resolve(g).toString)

  def read(spark: SparkSession, alias: String = "current"): Option[DataFrame] =
    currentPath(alias).map(readPath(spark, _))

  /** Time travel: read any retained generation directly (generations are
    * immutable once published — the Iceberg snapshot-read equivalent).
    * Routed through `generationPath`, so only a validated `gen-<n>`
    * DIRECTORY qualifies: the `current` pointer file, `_meta`, dotted
    * staging dirs, and path-traversal names all return None rather than
    * reaching the parquet reader. */
  def readGeneration(spark: SparkSession, gen: String): Option[DataFrame] =
    generationPath(gen).map(p => readPath(spark, p.toString))

  /** Read a generation through its schema sidecar when one exists. The
    * sidecar (written at stage time) makes a ZERO-ROW generation readable:
    * `partitionBy` of an empty DataFrame emits no parquet data files at all,
    * so schema inference would throw and a legitimate empty publish (e.g. a
    * first-ever sync over a source with no extractable triples) would brick
    * every later read of the table. It also skips footer-based schema
    * inference on non-empty reads. Pre-sidecar generations fall back to
    * plain inference. */
  private def readPath(spark: SparkSession, path: String): DataFrame =
    SparkIo.readParquetWithSidecar(spark, path)

  private def writeSchemaSidecar(df: DataFrame, stagedAt: String): Unit =
    SparkIo.writeSchemaSidecar(df.schema, Paths.get(stagedAt))

  /** Every alias pointer and the generation it references (control-plane
    * inspection surface — KgAdmin renders this; keeping the pointer-file
    * layout private to this class). */
  def aliases(): Seq[(String, String)] =
    if (!Files.exists(meta)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      val s = Files.list(meta)
      try s.iterator().asScala
        .filter(Files.isRegularFile(_))
        .filterNot(_.getFileName.toString.startsWith("."))
        .map(f => f.getFileName.toString ->
          new String(Files.readAllBytes(f), StandardCharsets.UTF_8).trim)
        .filter(_._2.startsWith("gen-"))
        .toSeq.sortBy(_._1)
      finally s.close()
    }

  /** Physical directory of a generation, if it exists. */
  def generationPath(gen: String): Option[Path] = {
    val p = root.resolve(gen)
    if (gen.matches("gen-\\d+") && Files.isDirectory(p)) Some(p) else None
  }

  /** All published generations, oldest first. */
  def generations(): Seq[String] =
    if (!Files.exists(root)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      val s = Files.list(root)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith("gen-"))
        .toSeq.sortBy(_.stripPrefix("gen-").toLong)
      finally s.close()
    }

  def stagingPath(runId: String): String = staging.resolve(runId).toString

  private val tableName = root.getFileName.toString

  /** Label this table's Spark jobs in the UI / listeners. */
  private def withJobDesc[T](df: DataFrame, desc: String)(body: => T): T =
    SparkIo.withJobDesc(df.sparkSession, s"$desc:$tableName")(body)

  /** Write a full snapshot into staging (not yet visible). */
  def stage(df: DataFrame, runId: String): String = {
    val p = stagingPath(runId)
    withJobDesc(df, "stage-table")(df.write.mode("overwrite").parquet(p))
    writeSchemaSidecar(df, p)
    p
  }

  /** Write a (possibly partial) snapshot into staging, physically partitioned
    * by the `bucket` column — the layout that makes incremental sync
    * overwrite only changed buckets (publishBuckets) and gives readers
    * partition pruning on bucket predicates.
    *
    * Rows are shuffled onto their bucket before the write: without it every
    * upstream task holds rows of every bucket and a B-bucket table explodes
    * into tasks x B tiny files (2000+ at test scale — file-listing and
    * hard-link costs then swamp the incremental win; at cluster scale the
    * same layout produces millions of sub-row-group files). One exchange
    * keyed by bucket gives one writer per bucket dir; AQE coalesces small
    * buckets, maxRecordsPerFile splits giant ones. */
  def stagePartitioned(df: DataFrame, runId: String): String = {
    val p = stagingPath(runId)
    withJobDesc(df, "stage-buckets") {
      df.repartition(col(TableCommitter.BucketCol))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 20000000)
        .partitionBy(TableCommitter.BucketCol).parquet(p)
    }
    writeSchemaSidecar(df, p)
    p
  }

  /** Row count of the current generation from parquet FOOTERS — driver-side
    * metadata only, zero Spark jobs (a Spark metadata-only count still
    * schedules ~2 jobs, pure overhead for a per-sync metric).
    *
    * Generations are immutable, so the first computation is cached in a
    * count sidecar inside the generation dir: every later sync against the
    * same generation (the nightly no-op case) reads ONE tiny file instead
    * of re-walking the table — at the 100 TB design point a per-run serial
    * footer walk over ~10^5-10^6 part files would dominate the "metadata
    * only" no-op. The cold computation itself fans the footer opens across
    * the driver's cores (footers are independent remote reads; the latency,
    * not the CPU, is the cost). Sidecar writes are atomic and best-effort —
    * a lost write only means the next caller recomputes. */
  def currentRecordCount(spark: SparkSession): Option[Long] =
    currentPath().map { p =>
      import scala.jdk.CollectionConverters._
      val dir = Paths.get(p)
      val sidecar = dir.resolve(TableCommitter.CountSidecar)
      scala.util.Try(Files.readString(sidecar).trim.toLong).getOrElse {
        val conf = spark.sessionState.newHadoopConf()
        val s = Files.walk(dir)
        val files =
          try s.iterator().asScala
            .filter(f => Files.isRegularFile(f) &&
              f.getFileName.toString.endsWith(".parquet"))
            .toSeq
          finally s.close()
        val n = files.asJava.parallelStream().mapToLong { f =>
          val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(f.toUri), conf))
          try rdr.getRecordCount finally rdr.close()
        }.sum()
        scala.util.Try {
          val tmp = dir.resolve(
            s".${TableCommitter.CountSidecar}.${java.util.UUID.randomUUID()}.tmp")
          Files.writeString(tmp, n.toString)
          Files.move(tmp, sidecar, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
        }
        n
      }
    }

  /** Whether the current generation was published with the bucketed layout
    * (bucket= partition dirs; an EMPTY bucketed publish is recognised via
    * its schema sidecar carrying the bucket column). `Some(false)` means a
    * pre-bucketing writer built this table — bucketed writers must refuse
    * it with a migration message instead of pinning a bucket_count that the
    * physical layout cannot honour. Metadata-only (one dir listing + one
    * small file read). */
  def currentIsBucketed(alias: String = "current"): Option[Boolean] =
    currentPath(alias).map { p =>
      val dir = Paths.get(p)
      bucketDirs(dir).nonEmpty || {
        val sidecar = dir.resolve(TableCommitter.SchemaSidecar)
        Files.exists(sidecar) &&
          org.apache.spark.sql.types.DataType.fromJson(Files.readString(sidecar))
            .asInstanceOf[org.apache.spark.sql.types.StructType]
            .fieldNames.contains(TableCommitter.BucketCol)
      }
    }

  private def bucketDirs(dir: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    if (!Files.exists(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith(s"${TableCommitter.BucketCol}="))
        .toSeq
      finally s.close()
    }
  }

  /** Hard-link every file of `src` into `dst` (same inodes — zero copy;
    * generations are immutable once published, so sharing is safe; this is
    * the manifest-file-reuse of an Iceberg incremental snapshot made
    * file-system-literal). */
  private def linkDir(src: Path, dst: Path): Unit = {
    Files.createDirectories(dst)
    val s = Files.walk(src)
    try s.filter(Files.isRegularFile(_)).forEach { f =>
      val rel = src.relativize(f)
      val out = dst.resolve(rel)
      Files.createDirectories(out.getParent)
      Files.createLink(out, f)
    } finally s.close()
  }

  /** Incremental bucket publish: gen-(n+1) = staged `bucket=` dirs (the
    * rewritten buckets) + hard-linked carryover of every current-generation
    * bucket NOT in `changedBuckets`. A sync touching k of B buckets therefore
    * writes exactly k bucket directories of new bytes; the other B-k are
    * shared by reference with the previous generation. `changedBuckets`
    * (not staged-dir presence) decides carryover, so a bucket whose rows all
    * vanished is correctly dropped rather than resurrected.
    *
    * This is the reference's per-doc-id upsert granularity
    * (Harvester.java:1849-1856) at bucket granularity, with snapshot
    * isolation: readers see gen-n until the pointer flips. */
  def publishBuckets(runId: String, changedBuckets: Set[Int],
                     alias: String = "current"): String = synchronized {
    // resume idempotence: a runId publishes at most once (see
    // publishedGeneration); stale re-staged data is discarded
    publishedGeneration(runId, alias) match {
      case Some(gen) => return republish(runId, gen, alias)
      case None =>
    }
    val stagedAt = staging.resolve(runId)
    require(Files.exists(stagedAt), s"nothing staged for $runId")
    // sweep orphan assembly dirs a crashed publish left behind (they were
    // never recorded or pointer-referenced, but they'd otherwise linger
    // forever, confuse time travel, and occupy retention slots)
    sweepTmpGens()
    val n = generations().lastOption
      .map(_.stripPrefix("gen-").toLong).getOrElse(-1L) + 1
    val gen = s"gen-$n"
    // assemble in a dotted tmp dir, then ATOMIC_MOVE into place: a crash
    // mid-assembly never leaves a partial gen-N visible to readGeneration /
    // generations() (dotted names don't match the gen- prefix)
    val tmpDir = root.resolve(s".$gen.tmp")
    Files.createDirectories(tmpDir)
    val changedNames = changedBuckets.map(b => s"${TableCommitter.BucketCol}=$b")
    // carry over untouched buckets from the live generation by hard link
    currentPath(alias).foreach { cur =>
      bucketDirs(Paths.get(cur))
        .filterNot(d => changedNames.contains(d.getFileName.toString))
        .foreach(d => linkDir(d, tmpDir.resolve(d.getFileName.toString)))
    }
    // move the rewritten buckets in from staging (caller contract: staged
    // data may only touch declared-changed buckets, or the hard-linked
    // carryover above would collide with it)
    val staged = bucketDirs(stagedAt)
    val undeclared = staged.map(_.getFileName.toString).filterNot(changedNames)
    require(undeclared.isEmpty,
      s"staged buckets not declared changed: ${undeclared.mkString(",")}")
    staged.foreach { d =>
      Files.move(d, tmpDir.resolve(d.getFileName.toString),
        StandardCopyOption.ATOMIC_MOVE)
    }
    Seq("_SUCCESS", TableCommitter.SchemaSidecar).foreach { f =>
      val src = stagedAt.resolve(f)
      if (Files.exists(src))
        Files.move(src, tmpDir.resolve(f), StandardCopyOption.REPLACE_EXISTING)
    }
    // a fresh staged write always carries a sidecar; keep a carried-over one
    // readable even if the caller staged through an out-of-band writer
    val sidecar = tmpDir.resolve(TableCommitter.SchemaSidecar)
    if (!Files.exists(sidecar))
      currentPath(alias).map(Paths.get(_).resolve(TableCommitter.SchemaSidecar))
        .filter(Files.exists(_))
        .foreach(Files.copy(_, sidecar))
    // the run marker travels INSIDE the generation: a crash after the move
    // but before recordRun would otherwise leave a complete, unreferenced
    // gen-N that the retry re-publishes as gen-(N+1) — a phantom forever
    // occupying a retention slot (publishedGeneration heals from the marker)
    Files.writeString(tmpDir.resolve(TableCommitter.RunMarker), s"$alias~$runId")
    Files.move(tmpDir, root.resolve(gen), StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(stagedAt)
    recordRun(runId, gen, alias)
    setPointer(alias, gen)
    gen
  }

  /** Delete assembly dirs (`.gen-*.tmp`) orphaned by a crash mid-publish.
    *
    * WRITER CONTRACT: one publishing process per table at a time (crash +
    * retry, never concurrent publishers — the same contract the gen
    * numbering and pointer flips already assume; runId idempotence serializes
    * retries). Under that contract any surviving tmp dir is a dead run's. */
  private def sweepTmpGens(): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(root)) {
      val s = Files.list(root)
      val orphans =
        try s.iterator().asScala.filter { p =>
          val n = p.getFileName.toString
          n.startsWith(".gen-") && n.endsWith(".tmp")
        }.toSeq
        finally s.close()
      orphans.foreach(deleteRecursively)
    }
  }

  /** Generation already published for this runId, if any — publishes are
    * runId-idempotent so a crash-and-resume never applies the same logical
    * update twice (the incremental edge/node merges are deltas: replaying
    * one would double-count). Recorded as `_meta/runs/<runId>` BEFORE the
    * pointer flip: a crash between the record and the flip is healed by the
    * early-return path, which re-points the alias forward; the reverse order
    * would leave a window where a resume re-applies the delta. */
  def publishedGeneration(runId: String,
                          alias: String = "current"): Option[String] = {
    val p = meta.resolve("runs").resolve(s"$alias~$runId")
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim)
    else {
      // crash window: generation moved into place but recordRun never ran —
      // the in-dir run marker identifies it; heal the record so the retry
      // takes the republish path instead of double-publishing
      val healed = generations().reverse.find { g =>
        val m = root.resolve(g).resolve(TableCommitter.RunMarker)
        Files.exists(m) && Files.readString(m).trim == s"$alias~$runId"
      }
      healed.foreach(g => recordRun(runId, g, alias))
      healed
    }
  }

  // run records are ALIAS-scoped: publishing the same runId under another
  // alias is an independent logical publish, and a record must never move a
  // pointer the runId was not published under
  private def recordRun(runId: String, gen: String, alias: String): Unit = {
    Files.createDirectories(meta.resolve("runs"))
    Files.write(meta.resolve("runs").resolve(s"$alias~$runId"),
      gen.getBytes(StandardCharsets.UTF_8))
  }

  /** Idempotent re-publish: discard stale staging, and heal a pointer that a
    * crash left behind the recorded generation (never regress a pointer that
    * a later run advanced). Caveat, documented: a DELIBERATE pointer
    * rollback followed by a replay of the pre-rollback runId is re-healed
    * forward — retire old runIds (or publish the rollback as its own
    * generation) when operating that way. */
  private def republish(runId: String, gen: String, alias: String): String = {
    rollback(runId)
    val cur = currentGeneration(alias)
      .map(_.stripPrefix("gen-").toLong).getOrElse(-1L)
    if (gen.stripPrefix("gen-").toLong > cur) setPointer(alias, gen)
    gen
  }

  /** Atomically publish a staged snapshot: move staging -> gen-(n+1), then
    * atomically replace the pointer. A reader either sees gen-n or gen-(n+1),
    * never a partial directory. Re-publishing an already-published runId is
    * a no-op returning the original generation (resume idempotence). */
  def publish(runId: String, alias: String = "current"): String = synchronized {
    publishedGeneration(runId, alias) match {
      case Some(gen) => return republish(runId, gen, alias)
      case None =>
    }
    val stagedAt = staging.resolve(runId)
    require(Files.exists(stagedAt), s"nothing staged for $runId")
    // next generation = max existing gen dir + 1 (NOT the alias pointer:
    // after a blue/green rollback the pointer lags behind published dirs
    // and pointer-derived numbering would collide with an existing gen)
    val n = generations().lastOption
      .map(_.stripPrefix("gen-").toLong).getOrElse(-1L) + 1
    val gen = s"gen-$n"
    Files.createDirectories(root)
    // marker before the move — see publishBuckets: heals a crash between
    // the move and recordRun
    Files.writeString(stagedAt.resolve(TableCommitter.RunMarker), s"$alias~$runId")
    Files.move(stagedAt, root.resolve(gen), StandardCopyOption.ATOMIC_MOVE)
    recordRun(runId, gen, alias)
    setPointer(alias, gen)
    gen
  }

  /** Pin an immutable table-layout property (e.g. the bucket count): first
    * caller writes it atomically, every later caller must agree — a writer
    * using a different key-to-bucket mapping than the table was built with
    * would replace rows in the wrong buckets and silently carry stale copies
    * forward.
    *
    * First-writer exclusivity uses hard-link creation (CREATE_NEW
    * semantics): rename(2) would silently REPLACE a concurrent winner's pin,
    * letting both racers proceed believing their own value won. The
    * unconditional read-back verifies the loser against the winner. */
  def pinOrVerify(key: String, value: String): Unit = {
    val pins = meta.resolve("pins")
    val f = pins.resolve(key)
    if (!Files.exists(f)) {
      Files.createDirectories(pins)
      val tmp = pins.resolve(s".$key.${java.util.UUID.randomUUID()}.tmp")
      Files.writeString(tmp, value)
      try Files.createLink(f, tmp)
      catch { // lost the first-writer race: fall through to the verify
        case _: java.nio.file.FileAlreadyExistsException => ()
      } finally Files.deleteIfExists(tmp)
    }
    val pinned = Files.readString(f).trim
    require(pinned == value,
      s"table pin '$key' is $pinned but this writer uses $value — " +
        "rebuild into a fresh table to change it")
  }

  /** Value of a table pin if any writer has pinned it — lets callers
    * distinguish "never pinned" (adoption about to happen) from "pinned to
    * X" before calling [[pinOrVerify]]; see [[pinKeyExprOrVerify]]. */
  def pinned(key: String): Option[String] = {
    val f = meta.resolve("pins").resolve(key)
    if (Files.exists(f)) Some(Files.readString(f).trim) else None
  }

  /** Pin the bucket-key expression with an ADOPTION guard: a table built
    * BEFORE the expression was pinnable has generations but no pin — its
    * physical layout is the default hash mapping, so the only expression a
    * first pin may adopt onto it is `default`. Blessing any other mapping
    * onto an existing layout would make the next incremental publish
    * replace rows in the wrong buckets and hard-link stale duplicates
    * forward, silently. */
  def pinKeyExprOrVerify(expr: String, default: String): Unit = {
    if (currentGeneration().isDefined && pinned("bucket_key_expr").isEmpty &&
        expr != default)
      throw new IllegalStateException(
        s"bucketKeyExpr=$expr on a table built before the key expression " +
          "was pinned (its layout is the default hash mapping) — changing " +
          "the mapping requires a fresh workDir (or a full rebuild into one)")
    pinOrVerify("bucket_key_expr", expr)
  }

  /** Pin the row-semantics signature with the same ADOPTION guard as
    * [[pinKeyExprOrVerify]]: a table that has generations but no semantics
    * pin predates the pin, and what its rows MEAN is unknowable from here —
    * blessing the current flags onto it would let later writes additively
    * merge rows of a second semantics into it with no error, the exact
    * failure the pin exists to prevent. Refuse loudly instead. */
  def pinSemanticsOrVerify(sig: String): Unit = {
    if (currentGeneration().isDefined && pinned("semantics").isEmpty)
      throw new IllegalStateException(
        "table has published generations but no semantics pin (it was " +
          "built before row semantics were pinned) — rebuild it from a " +
          "fresh checkpoint / full run so the pin records what its rows mean")
    pinOrVerify("semantics", sig)
  }

  /** Point an alias at an existing generation (blue/green switch, K6). */
  def setPointer(alias: String, gen: String): Unit = {
    // the meta dir also holds the run-record DIRECTORY and dot-prefixed
    // temp files: an alias colliding with either would clobber run records
    // (Files.move onto _meta/runs) or fight the .alias.tmp convention
    require(alias.matches("[A-Za-z0-9][A-Za-z0-9_-]*") &&
      alias != "runs" && alias != "pins",
      s"invalid alias name '$alias'")
    Files.createDirectories(meta)
    val tmp = meta.resolve(s".$alias.tmp")
    Files.write(tmp, gen.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointerFile(alias),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Idempotent MERGE-by-key (copy-on-write): rows of `updates` replace
    * current rows with the same key; everything else carries over. This is
    * the reference's id-addressed bulk upsert (doc id subj@lang overwrites,
    * Harvester.java:1849-1856) with snapshot isolation. Re-running the same
    * merge is a no-op on content. */
  def merge(spark: SparkSession, updates: DataFrame, keyCols: Seq[String],
            runId: String, alias: String = "current"): String = {
    val deduped = updates.dropDuplicates(keyCols)
    val merged = read(spark, alias) match {
      case Some(cur) =>
        cur.join(deduped.select(keyCols.map(col): _*), keyCols, "left_anti")
          .unionByName(deduped)
      case None => deduped
    }
    stage(merged, runId)
    publish(runId, alias)
  }

  /** MERGE ... WHEN NOT MATCHED BY SOURCE THEN DELETE — drop current rows
    * whose key is absent from `keep` (the sync delete anti-join, J4,
    * Harvester.java:1045-1162). */
  def deleteMissing(spark: SparkSession, keep: DataFrame, keyCols: Seq[String],
                    runId: String, alias: String = "current"): Option[String] =
    read(spark, alias).map { cur =>
      val kept = cur.join(keep.select(keyCols.map(col): _*).distinct(),
        keyCols, "left_semi")
      stage(kept, runId)
      publish(runId, alias)
    }

  /** Remove staged (unpublished) data — K5: the pointer never moved, so the
    * live table is untouched. */
  def rollback(runId: String): Unit = {
    val p = staging.resolve(runId)
    if (Files.exists(p)) deleteRecursively(p)
  }

  /** Snapshot retention (the Iceberg expire_snapshots analogue; reference:
    * stale `@temp-` cleanup, Harvester.deleteTempIndexIfExists,
    * Harvester.java:793-810): delete all but the newest `keepLast`
    * generations, never touching one an alias pointer references. Bucket
    * carryover uses hard links, so deleting an old generation only drops
    * its directory entries — files shared with newer generations survive on
    * their remaining links; physical space is reclaimed exactly for bytes
    * no retained generation references.
    * @return the generations deleted. */
  def expireGenerations(keepLast: Int): Seq[String] = synchronized {
    require(keepLast >= 1, "must retain at least one generation")
    import scala.jdk.CollectionConverters._
    val referenced: Set[String] =
      if (!Files.exists(meta)) Set.empty
      else {
        val s = Files.list(meta)
        try s.iterator().asScala
          .filter(Files.isRegularFile(_))
          .filterNot(_.getFileName.toString.startsWith("."))
          .map(f => new String(Files.readAllBytes(f), StandardCharsets.UTF_8).trim)
          .toSet
        finally s.close()
      }
    val gens = generations()
    val expire = gens.dropRight(keepLast).filterNot(referenced)
    expire.foreach(g => deleteRecursively(root.resolve(g)))
    // retire run records pointing at expired generations: a replayed runId
    // must re-publish (or fail staging requirements) rather than "succeed"
    // returning a generation that no longer exists
    val runsDir = meta.resolve("runs")
    if (Files.exists(runsDir)) {
      val expired = expire.toSet
      val s = Files.list(runsDir)
      try s.iterator().asScala
        .filter(f => expired.contains(
          new String(Files.readAllBytes(f), StandardCharsets.UTF_8).trim))
        .toSeq // materialize before deleting (stream over a mutating dir)
        .foreach(Files.delete(_))
      finally s.close()
    }
    expire
  }

  private def deleteRecursively(p: Path): Unit = {
    val s = Files.walk(p)
    try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    finally s.close()
  }
}

object TableCommitter {
  /** Physical partition column of bucketed tables. */
  val BucketCol = "bucket"

  /** Per-generation schema sidecar file name (leading underscore: parquet
    * readers ignore it as metadata, like _SUCCESS). */
  val SchemaSidecar = "_graft_schema.json"

  /** In-generation run marker (`alias~runId` of the publish that created the
    * generation) — lets publishedGeneration heal a run record lost to a
    * crash between the generation move and recordRun. */
  val RunMarker = "_graft_run"

  /** Per-generation record-count cache (leading underscore: ignored by
    * parquet readers). Written lazily by [[TableCommitter.currentRecordCount]]
    * — generations are immutable, so the count can never go stale. */
  val CountSidecar = "_graft_count"
}
