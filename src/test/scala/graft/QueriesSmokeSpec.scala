package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registered query runs and the flagship yields rows at the
  * smallest scale factor. Full value-level correctness is the driver's DuckDB
  * gate (oracle parity is pre-checked per query). */
class QueriesSmokeSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  test("entry produces rows") {
    val spark = SparkTestSession.get
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key exists in queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("all queries execute at sf0.001") {
    val spark = SparkTestSession.get
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
