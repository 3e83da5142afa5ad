package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticalQueries, CurationQueries, DedupQueries, GraphQueries, KgQueries, MaterializeQueries, Q, RelationalQueries, SparqlQueries, TextStatsQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: SURVEY.md §2 operator inventory (RelationalQueries), the
  * KG-construction pipeline stages (KgQueries), and the training-data
  * dedup/similarity/text-analysis operators (DedupQueries, TextStatsQueries).
  * Each entry carries a DuckDB oracle where SQL-expressible; iterative ops
  * (connected components) ship a recursive-CTE oracle.
  */
object SparkEntry {

  private val registry: Map[String, Q] =
    RelationalQueries.all ++ KgQueries.all ++ GraphQueries.all ++
      DedupQueries.all ++ TextStatsQueries.all ++ CurationQueries.all ++
      AnalyticalQueries.all ++ MaterializeQueries.all ++ SparqlQueries.all

  /** Flagship: the full extract->link->materialize mini-pipeline on sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry("kg_triples_full").fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, q) => name -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, Q(_, Some(sql))) => name -> sql }
}
