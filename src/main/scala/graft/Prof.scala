package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.config.PipelineConfig
import graft.extract.Extractor
import graft.pipeline.KgPipeline
import graft.schema.Turn
import graft.sources.TranscriptGen

/** Scratch profiler (not part of the product surface). */
object Prof {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val dir = args(1)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val turns = spark.read.parquet(dir).as[Turn]
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-22s ${(System.nanoTime()-t0)/1e9}%8.2fs  rows=$n")
    }
    time("scan_count")(turns.count())
    time("scan_count2")(turns.count())
    val cat = TranscriptGen.catalog(50)
    time("extract_only")(Extractor.extract(turns, cat, TranscriptGen.markerPreds).count())
    val p = new KgPipeline(PipelineConfig(numPartitions = cores * 2))
    time("prepare_only")(p.prepare(turns).count())
    time("extract_prepared")(Extractor.extract(p.prepare(turns), cat, TranscriptGen.markerPreds).count())
    time("full_supports")(p.computeSupports(spark, turns, cat, TranscriptGen.markerPreds)
      .groupBy("subj","pred","obj","lang").count().count())
    spark.stop()
  }
}
