package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.io.TableCommitter

class TableCommitterSpec extends AnyFunSuite {

  private def fresh() = new TableCommitter(
    Files.createTempDirectory("committer-").toString)

  test("staged data is invisible until publish; publish flips atomically") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val t = fresh()
    t.stage(Seq((1, "a")).toDF("k", "v"), "r1")
    assert(t.read(spark).isEmpty)
    val gen = t.publish("r1")
    assert(gen == "gen-0")
    assert(t.read(spark).get.collect().map(r => (r.getInt(0), r.getString(1))).toSet
      == Set((1, "a")))
  }

  test("rollback removes staging, live table untouched (K5)") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val t = fresh()
    t.stage(Seq((1, "a")).toDF("k", "v"), "r1"); t.publish("r1")
    t.stage(Seq((2, "b")).toDF("k", "v"), "r2")
    t.rollback("r2")
    assert(t.read(spark).get.count() == 1)
    intercept[IllegalArgumentException](t.publish("r2"))
  }

  test("merge-by-key: updates win, others carry over; re-merge is idempotent") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val t = fresh()
    t.stage(Seq((1, "a"), (2, "b")).toDF("k", "v"), "r1"); t.publish("r1")
    t.merge(spark, Seq((2, "B"), (3, "c")).toDF("k", "v"), Seq("k"), "r2")
    val want = Set((1, "a"), (2, "B"), (3, "c"))
    def content = t.read(spark).get.collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(content == want)
    t.merge(spark, Seq((2, "B"), (3, "c")).toDF("k", "v"), Seq("k"), "r3")
    assert(content == want)
  }

  test("deleteMissing drops keys absent from keep-set (J4)") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val t = fresh()
    t.stage(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"), "r1"); t.publish("r1")
    t.deleteMissing(spark, Seq(Tuple1(1), Tuple1(3)).toDF("k"), Seq("k"), "r2")
    assert(t.read(spark).get.collect().map(_.getInt(0)).toSet == Set(1, 3))
  }

  test("time travel: every published generation stays readable") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val t = fresh()
    t.stage(Seq((1, "v1")).toDF("k", "v"), "r1"); t.publish("r1")
    t.merge(spark, Seq((1, "v2")).toDF("k", "v"), Seq("k"), "r2")
    assert(t.generations() == Seq("gen-0", "gen-1"))
    assert(t.readGeneration(spark, "gen-0").get.head().getString(1) == "v1")
    assert(t.readGeneration(spark, "gen-1").get.head().getString(1) == "v2")
    assert(t.readGeneration(spark, "gen-9").isEmpty)
  }

  test("regression: publish after pointer rollback allocates a fresh generation") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val t = fresh()
    t.stage(Seq(Tuple1("v0")).toDF("v"), "r1"); t.publish("r1") // gen-0
    t.stage(Seq(Tuple1("v1")).toDF("v"), "r2"); t.publish("r2") // gen-1
    t.setPointer("current", "gen-0") // rollback
    t.stage(Seq(Tuple1("v2")).toDF("v"), "r3")
    val gen = t.publish("r3") // pointer said gen-0; must NOT collide with gen-1
    assert(gen == "gen-2")
    assert(t.read(spark).get.head().getString(0) == "v2")
    assert(t.readGeneration(spark, "gen-1").get.head().getString(0) == "v1")
  }

  test("expireGenerations keeps the newest K + alias-referenced; hard-linked " +
       "carryover files survive on their remaining links") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val t = fresh()
    // bucketed history: gen-0 full, gen-1..3 each rewrite only bucket 1, so
    // bucket 0's file is hard-link-shared across all generations
    t.stagePartitioned(Seq((1, "a", 0), (2, "b", 1)).toDF("k", "v", "bucket"), "r0")
    t.publishBuckets("r0", Set(0, 1))
    (1 to 3).foreach { i =>
      t.stagePartitioned(Seq((2, s"b$i", 1)).toDF("k", "v", "bucket"), s"r$i")
      t.publishBuckets(s"r$i", Set(1))
    }
    t.setPointer("pinned", "gen-1") // an alias protects an old generation
    val expired = t.expireGenerations(keepLast = 2)
    assert(expired == Seq("gen-0")) // gen-1 pinned, gen-2/3 retained
    assert(t.generations() == Seq("gen-1", "gen-2", "gen-3"))
    // live reads unaffected; shared bucket-0 file still readable everywhere
    assert(t.read(spark).get.filter($"bucket" === 0).count() == 1)
    assert(t.read(spark, "pinned").get.count() == 2)
    assert(t.read(spark).get.filter($"k" === 2).head().getString(1) == "b3")
    // the expired generation's run record is retired with it: a replayed
    // runId must not "succeed" returning a generation that no longer exists
    assert(t.publishedGeneration("r0").isEmpty)
    assert(t.publishedGeneration("r3").contains("gen-3"))
    // retaining fewer than 1 is rejected
    intercept[IllegalArgumentException](t.expireGenerations(0))
  }

  test("a zero-row bucketed publish stays readable (schema sidecar) and " +
       "does not brick later syncs") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val t = fresh()
    val empty = Seq.empty[(Int, String, Int)].toDF("k", "v", "bucket")
    // partitionBy of an empty DF writes no parquet data files at all —
    // without the sidecar this generation would throw on every read
    t.stagePartitioned(empty, "r0")
    t.publishBuckets("r0", Set.empty)
    val got = t.read(spark).get
    assert(got.count() == 0)
    assert(got.columns.toSeq == Seq("k", "v", "bucket"))
    // a later incremental publish over the empty generation works normally
    t.stagePartitioned(Seq((1, "a", 0)).toDF("k", "v", "bucket"), "r1")
    t.publishBuckets("r1", Set(0))
    assert(t.read(spark).get.collect().map(r => (r.getInt(0), r.getString(1))).toSet
      == Set((1, "a")))
    // the intermediate empty generation stays time-travel readable too
    assert(t.readGeneration(spark, "gen-0").get.count() == 0)
  }

  test("a crash mid-publishBuckets leaves no orphan generation dir") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val t = fresh()
    t.stagePartitioned(Seq((1, "a", 0), (2, "b", 1)).toDF("k", "v", "bucket"), "r0")
    t.publishBuckets("r0", Set(0, 1))
    // simulate the crash: an assembly tmp dir left behind mid-publish
    val root = java.nio.file.Paths.get(t.currentPath().get).getParent
    val orphan = root.resolve(".gen-1.tmp")
    Files.createDirectories(orphan.resolve("bucket=0"))
    Files.writeString(orphan.resolve("bucket=0").resolve("junk.parquet"), "x")
    // orphans are invisible to generations() (and so to retention/time travel)
    assert(t.generations() == Seq("gen-0"))
    // ...and the next publish sweeps them and numbers correctly
    t.stagePartitioned(Seq((2, "b2", 1)).toDF("k", "v", "bucket"), "r1")
    val gen = t.publishBuckets("r1", Set(1))
    assert(gen == "gen-1")
    assert(!Files.exists(orphan))
    assert(t.read(spark).get.filter($"k" === 2).head().getString(1) == "b2")
  }

  test("crash between the generation move and recordRun heals from the " +
       "in-generation run marker — no phantom duplicate generation") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val t = fresh()
    t.stagePartitioned(Seq((1, "a", 0)).toDF("k", "v", "bucket"), "r0")
    t.publishBuckets("r0", Set(0))
    t.stagePartitioned(Seq((1, "b", 0)).toDF("k", "v", "bucket"), "r1")
    t.publishBuckets("r1", Set(0))
    // simulate the crash window: gen-1 was moved into place, but the run
    // record and pointer flip were lost
    val meta = java.nio.file.Paths.get(t.currentPath().get).getParent.resolve("_meta")
    Files.delete(meta.resolve("runs").resolve("current~r1"))
    t.setPointer("current", "gen-0")
    // the retried run re-stages and republishes the same runId
    t.stagePartitioned(Seq((1, "b", 0)).toDF("k", "v", "bucket"), "r1")
    val gen = t.publishBuckets("r1", Set(0))
    assert(gen == "gen-1", "retry must adopt the already-moved generation")
    assert(t.generations() == Seq("gen-0", "gen-1"), "phantom generation created")
    assert(t.currentGeneration().contains("gen-1"))
    assert(t.read(spark).get.head().getString(1) == "b")
  }

  test("pinOrVerify: first writer pins, later writers must agree") {
    val t = fresh()
    t.pinOrVerify("bucket_count", "16")
    t.pinOrVerify("bucket_count", "16") // same value: fine
    val ex = intercept[IllegalArgumentException](t.pinOrVerify("bucket_count", "64"))
    assert(ex.getMessage.contains("bucket_count"))
  }

  test("blue/green alias pointers flip between generations (K6)") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val t = fresh()
    t.stage(Seq(Tuple1("blue")).toDF("v"), "r1"); t.publish("r1")
    t.stage(Seq(Tuple1("green")).toDF("v"), "r2"); t.publish("r2")
    // current points at gen-1; serve alias flips back to gen-0
    t.setPointer("serve", "gen-0")
    assert(t.read(spark, "serve").get.head().getString(0) == "blue")
    assert(t.read(spark).get.head().getString(0) == "green")
    t.setPointer("serve", "gen-1")
    assert(t.read(spark, "serve").get.head().getString(0) == "green")
    // alias names colliding with the meta-dir layout are refused: "runs"
    // (run records) and "pins" (pin directory) — a pointer file REPLACE_
    // EXISTING onto either would clobber table metadata
    intercept[IllegalArgumentException](t.setPointer("runs", "gen-0"))
    intercept[IllegalArgumentException](t.setPointer("pins", "gen-0"))
  }

  test("currentRecordCount caches per immutable generation (one tiny file " +
       "on the nightly no-op path, never a per-run footer walk)") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val t = fresh()
    t.stage((1 to 7).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(3), "r1")
    t.publish("r1")
    assert(t.currentRecordCount(spark).contains(7L))
    // the count landed in the generation's sidecar...
    val sidecar = java.nio.file.Paths.get(t.currentPath().get)
      .resolve(TableCommitter.CountSidecar)
    assert(Files.readString(sidecar).trim == "7")
    // ...and later calls SERVE it (generations are immutable, so this can
    // never go stale; proven here by planting a marker value)
    Files.writeString(sidecar, "99")
    assert(t.currentRecordCount(spark).contains(99L))
    // a new generation has no sidecar: recompute from footers, re-cache
    t.stage((1 to 4).map(i => (i, s"v$i")).toDF("k", "v"), "r2")
    t.publish("r2")
    assert(t.currentRecordCount(spark).contains(4L))
    assert(Files.readString(java.nio.file.Paths.get(t.currentPath().get)
      .resolve(TableCommitter.CountSidecar)).trim == "4")
  }

  test("pinned/pinKeyExprOrVerify: adoption of a non-default key expression " +
       "onto a pre-pin table with generations is refused") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val t = fresh()
    assert(t.pinned("bucket_key_expr").isEmpty)
    // empty table: first writer may pin anything (the layout is being built
    // under the pinned mapping right now)
    t.pinKeyExprOrVerify("epoch_week({k})", "hash({k})")
    assert(t.pinned("bucket_key_expr").contains("epoch_week({k})"))

    // a table with GENERATIONS but no pin was physically laid out by a
    // pre-pin writer (default mapping): only the default may be adopted
    val old = fresh()
    old.stage(Seq(Tuple1("x")).toDF("v"), "r1"); old.publish("r1")
    val e = intercept[IllegalStateException](
      old.pinKeyExprOrVerify("epoch_week({k})", "hash({k})"))
    assert(e.getMessage.contains("built before"))
    old.pinKeyExprOrVerify("hash({k})", "hash({k})") // default: legitimate
    // once pinned, a different expression is the ordinary pin mismatch
    intercept[IllegalArgumentException](
      old.pinKeyExprOrVerify("epoch_week({k})", "hash({k})"))
  }

  test("pinSemanticsOrVerify: adoption onto a pre-pin table with " +
       "generations is refused — its rows' semantics are unknowable") {
    val spark = SparkTestSession.get
    import spark.implicits._
    // empty table: first writer adopts (the rows are about to be built
    // under exactly this signature)
    val t = fresh()
    t.pinSemanticsOrVerify("coref=false,scored=true")
    t.pinSemanticsOrVerify("coref=false,scored=true") // same sig verifies
    intercept[IllegalArgumentException](
      t.pinSemanticsOrVerify("coref=true,scored=true")) // flip: pin mismatch

    // generations but no pin: ANY signature is refused — unlike the bucket
    // key there is no knowable default the legacy rows must have had
    val old = fresh()
    old.stage(Seq(Tuple1("x")).toDF("v"), "r1"); old.publish("r1")
    val e = intercept[IllegalStateException](
      old.pinSemanticsOrVerify("coref=false,scored=false"))
    assert(e.getMessage.contains("semantics pin"))
  }
}
