package graft

import org.apache.spark.sql.SparkSession
import graft.sources.TranscriptGen

/** Distributed bench-corpus writer: GenCorpus <nConv> <outDir>. */
object GenCorpus {
  def main(args: Array[String]): Unit = {
    val nConv = args(0).toInt
    val out = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    TranscriptGen.generateDistributed(spark, nConv, partitions = 128)
      .write.mode("overwrite").parquet(out)
    println(s"""{"written":"$out","nConv":$nConv}""")
    spark.stop()
  }
}
