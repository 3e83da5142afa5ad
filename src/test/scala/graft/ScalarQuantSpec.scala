package graft

import org.scalatest.funsuite.AnyFunSuite

/** Quality lock for the int8 scalar-quantized ANN path (`ann_sq_int8`):
  * the quantized top-5 must agree with the exact cosine top-5
  * (`ann_topk_brute`) on most neighbors — quantization is an approximation
  * by design, so the gate is recall, not equality. Also pins the code
  * range (every quantized value an integer in [-127, 127]). */
class ScalarQuantSpec extends AnyFunSuite {

  test("quantized recall@5 vs exact cosine ranking >= 0.85 (sf0.01)") {
    val spark = SparkTestSession.get
    val dir = "/root/testdata/sf0.01"
    val reg = graft.queries.DedupQueries.all
    val exact = reg("ann_topk_brute").fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val quant = reg("ann_sq_int8").fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    assert(exact.keySet == quant.keySet)
    val recalls = exact.keys.toSeq.map { q =>
      (exact(q) intersect quant(q)).size.toDouble / exact(q).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.85, s"mean recall@5 = $mean")
  }

  test("codes are integers in [-127, 127]") {
    val spark = SparkTestSession.get
    import org.apache.spark.sql.functions._
    import graft.Tables
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
    val nrm = sqrt(graft.functions.DotProduct.dot(col("v"), col("v")))
    val q = e.select(explode(transform(col("v"), x =>
      floor(greatest(least(x / nrm, lit(1.0)), lit(-1.0)) * 127).cast("double"))).as("c"))
    val bad = q.filter(col("c") < -127 || col("c") > 127 || col("c") =!= floor(col("c")).cast("double"))
    assert(bad.count() == 0)
  }
}
