package graft

import org.scalatest.funsuite.AnyFunSuite

/** Approximate aggregates have no cross-engine oracle (sketch
  * implementations differ); the contract is the error bound vs exact. */
class ApproxSpec extends AnyFunSuite {
  test("approx_count_distinct stays within its 2% rsd bound (x5 slack)") {
    val spark = SparkTestSession.get
    val sf = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("agg_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val err = math.abs(approx(k) - n).toDouble / n
      assert(err <= 0.10, s"$k: approx=${approx(k)} exact=$n err=$err")
    }
  }
}
