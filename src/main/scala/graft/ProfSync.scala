package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.config.PipelineConfig
import graft.pipeline.KgPipeline
import graft.schema.Turn
import graft.sources.TranscriptGen

/** Scratch profiler for the incremental-sync path (not part of the product
  * surface): prints per-Spark-job wall times with job descriptions so the
  * fixed-cost structure of runFull vs runSync is visible. */
object ProfSync {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val t0s = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        t0s.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description")).getOrElse("")))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, desc) = t0s.getOrDefault(je.jobId, (0L, "?"))
        System.err.println(f"JOB ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.2fs  $desc")
      }
    })

    val nConvSync = if (args.length > 1) args(1).toInt else 200000
    val full = TranscriptGen.generateDistributed(spark, nConvSync, partitions = 64).toDF()
    val convNum = substring(col("conv_id"), 6, 6).cast("int")
    val heldBack = (convNum % (nConvSync / 5) === 3) && (col("turn_idx") > 3)
    val base = s"/tmp/graft-sync-bench-$nConvSync"
    val t0Dir = s"$base/t0"; val t1Dir = s"$base/t1"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(t0Dir))) {
      full.filter(!heldBack).write.mode("overwrite").parquet(t0Dir)
      spark.read.parquet(t0Dir)
        .unionByName(full.filter(heldBack)
          .withColumn("ts", col("ts") + expr("INTERVAL 30 DAYS")))
        .write.mode("overwrite").parquet(t1Dir)
    }
    val wd = s"/tmp/graft-sync-prof-${System.nanoTime()}"
    val p = new KgPipeline(PipelineConfig(workDir = wd, syncBuckets = 64))
    val cat = TranscriptGen.catalog(50)
    def phase[T](name: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"PHASE $name%-14s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      spark.sparkContext.setJobDescription(null)
      r
    }
    phase("runFull") {
      p.runFull(spark, spark.read.parquet(t0Dir).as[Turn], cat,
        TranscriptGen.markerPreds, "prof-full")
    }
    phase("runSync") {
      p.runSync(spark, spark.read.parquet(t1Dir).as[Turn], cat,
        TranscriptGen.markerPreds, "prof-sync")
    }
    // the fixed-overhead floor: a sync with NOTHING changed (same input
    // again) — every job here is pure per-sync overhead
    phase("runSyncNoop") {
      p.runSync(spark, spark.read.parquet(t1Dir).as[Turn], cat,
        TranscriptGen.markerPreds, "prof-sync-noop")
    }
    spark.stop()
  }
}
