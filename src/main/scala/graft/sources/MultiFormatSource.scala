package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Uniform multi-format ingestion (S5: the reference parses RDF/XML dump
  * URIs into its Model, Harvester.java:1702-1730; the Spark-native engine
  * ingests any columnar/text format into the same Dataset shape).
  *
  * An explicit schema is required for text formats — schema inference scans
  * the data twice and guesses types, both unacceptable at 100 TB.
  */
object MultiFormatSource {

  /** @param csvMultiLine opt IN for CSV sources whose quoted fields embed
    *        newlines: multiLine parsing makes every file single-task
    *        (non-splittable) — the default keeps files line-splittable,
    *        which is the whole point of columnar/line formats at 100 TB. */
  def read(spark: SparkSession, path: String, format: String,
           schema: Option[StructType] = None,
           csvMultiLine: Boolean = false): DataFrame = {
    val r = spark.read.format(format match {
      case "jsonl" => "json"
      case f => f
    })
    val withSchema = schema.fold(r)(r.schema)
    format match {
      case "csv" => withSchema
        .option("header", "true")
        .option("multiLine", csvMultiLine.toString)
        .load(path)
      case _ => withSchema.load(path)
    }
  }

  /** Union many (path, format) sources into one Dataset with set semantics —
    * the reference's multi-source model.add() bag-union + graph set
    * semantics (S6/U1, Harvester.java:1640-1659). */
  def unionAll(spark: SparkSession, sources: Seq[(String, String)],
               schema: StructType, dedupKeys: Seq[String]): DataFrame = {
    require(sources.nonEmpty, "unionAll needs at least one source")
    // dropDuplicates(Nil) is a GLOBAL aggregate in Spark — one arbitrary
    // surviving row, a silent near-total data loss for a likely-intended
    // "dedup on all columns"; demand explicit keys instead
    require(dedupKeys.nonEmpty,
      "dedupKeys must be non-empty (use the full column list for whole-row dedup)")
    sources.map { case (p, f) => read(spark, p, f, Some(schema)) }
      .reduce(_ unionByName _)
      .dropDuplicates(dedupKeys)
  }
}
