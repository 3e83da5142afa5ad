package graft.io

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Shared small I/O helpers used by the committer, the checkpoint store and
  * the pipeline — single definitions so semantics (job-description restore,
  * sidecar atomicity, schema-JSON format) cannot drift between call sites. */
object SparkIo {

  /** Label the Spark jobs of `body` in the UI / listeners, restoring the
    * caller's description afterwards (calls nest). */
  def withJobDesc[T](spark: SparkSession, desc: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(s"graft:$desc")
    try body finally sc.setJobDescription(prev)
  }

  /** Atomically write the schema sidecar for a parquet directory: makes a
    * zero-data-file directory readable and spares readers the footer-based
    * schema-inference job. */
  def writeSchemaSidecar(schema: StructType, dir: Path): Unit = {
    val tmp = dir.resolve(s".${TableCommitter.SchemaSidecar}.tmp")
    Files.writeString(tmp, schema.json)
    Files.move(tmp, dir.resolve(TableCommitter.SchemaSidecar),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read a parquet directory through its schema sidecar when present;
    * pre-sidecar directories fall back to normal inference. */
  def readParquetWithSidecar(spark: SparkSession, path: String): DataFrame = {
    val sidecar = java.nio.file.Paths.get(path)
      .resolve(TableCommitter.SchemaSidecar)
    if (Files.exists(sidecar))
      spark.read
        .schema(DataType.fromJson(Files.readString(sidecar))
          .asInstanceOf[StructType])
        .parquet(path)
    else spark.read.parquet(path)
  }
}
