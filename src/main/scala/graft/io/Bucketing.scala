package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffled storage so repeated large joins and
  * aggregations on the bucket keys run with NO exchange (SURVEY.md §4
  * partitioning row — co-located joins via bucketing). At 100 TB this is the
  * difference between re-shuffling the fact table per query and reading it
  * join-ready; the bucket count is the table's fixed parallelism unit. */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets on the
    * same keys, so sort-merge joins skip the sort too). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int): Unit =
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
