package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-verifiable query: a Spark DataFrame program plus (where
  * SQL-expressible) the equivalent ANSI SQL the driver runs in DuckDB on the
  * same parquet tables. Column names and row ordering are made identical on
  * both sides — the driver sorts columns by name and hashes values. */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(fn, Some(oracle))
  def noOracle(fn: (SparkSession, String) => DataFrame): Q = Q(fn, None)
}
