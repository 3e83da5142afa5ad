package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.config.PipelineConfig
import graft.pipeline.KgPipeline
import graft.sources.TranscriptGen

class SqlSurfaceSpec extends AnyFunSuite {

  test("graft_dot is callable from SQL after registration") {
    val spark = SparkTestSession.get
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(got == 32.0)
  }

  test("registered temp views answer plain SQL over the sf tables") {
    val spark = SparkTestSession.get
    GraftExtensions.registerTables(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      """SELECT count(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_totalprice > 0""".stripMargin).head().getLong(0)
    assert(n > 0)
    // native function over a real table column
    val d = spark.sql(
      """SELECT graft_dot(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) AS n2
        |FROM embeddings LIMIT 1""".stripMargin).head().getDouble(0)
    assert(d > 0)
  }

  test("pipeline publishes the document table when enabled") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val fx = TranscriptGen.generate(nConv = 10, nEnt = 10, hotFactor = 2)
    val p = new KgPipeline(PipelineConfig(
      workDir = Files.createTempDirectory("docs-").toString, publishDocs = true))
    p.runFull(spark, fx.turns.toDS(), fx.catalog, fx.markers, "r")
    val docs = p.docTable.read(spark).get
    assert(docs.count() > 0)
    val row = docs.orderBy("id").head()
    assert(row.getString(0) == s"${row.getString(1)}@${row.getString(2)}") // id = subj@lang
  }
}
