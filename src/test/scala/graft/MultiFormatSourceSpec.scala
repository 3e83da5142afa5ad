package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{MultiFormatSource, TranscriptGen}

class MultiFormatSourceSpec extends AnyFunSuite {

  test("parquet/json/csv of the same turns read back identically; union dedups") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val fx = TranscriptGen.generate(nConv = 5, nEnt = 5, hotFactor = 1)
    val ds = fx.turns.toDS()
    val base = Files.createTempDirectory("mfs-").toString
    ds.write.parquet(s"$base/p")
    ds.write.json(s"$base/j")
    ds.coalesce(1).write.option("header", "true").csv(s"$base/c")

    val schema = ds.schema
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("conv_id", "turn_idx", "text").collect()
        .map(r => (r.getString(0), r.get(1).toString, r.getString(2))).toSet

    val p = MultiFormatSource.read(spark, s"$base/p", "parquet")
    val j = MultiFormatSource.read(spark, s"$base/j", "json", Some(schema))
    val c = MultiFormatSource.read(spark, s"$base/c", "csv", Some(schema))
    assert(key(p) == key(j))
    assert(key(p) == key(c))

    // union of overlapping sources keeps set semantics
    val u = MultiFormatSource.unionAll(spark,
      Seq((s"$base/p", "parquet"), (s"$base/j", "json")),
      schema, Seq("conv_id", "turn_idx"))
    assert(u.count() == ds.count())
  }
}
