package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, batch-shaped decode / feature-extract /
  * frame-sample kernels.
  *
  * The Spark-side mechanics (schema, partition-parallel batch processing,
  * kernel signature) are real and tested; the *decoder itself* is a
  * clearly-marked deterministic stub — the container ships no image/audio
  * codecs, and at cluster scale the stub body is replaced by the actual
  * codec call with zero plan changes. In PySpark this stage would be
  * `mapInPandas`; the Scala-native equivalent is a partition-batched
  * `mapPartitions` over the binary column, which keeps the same
  * one-batch-per-invocation shape.
  */
object Multimodal {

  /** Feature row produced by the decode kernel. */
  final case class MediaFeatures(
      doc_id: Long,
      modality: String,
      n_bytes: Int,
      features: Array[Float])

  /** Attach a synthetic binary payload + modality metadata to documents
    * (deterministic fake: md5 bytes of the text). */
  def attachPayload(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      unhex(md5(col("text").cast("binary"))).as("payload"),
      struct(
        length(col("text")).as("source_len"),
        lit(16).as("payload_len")).as("meta"))

  /** STUB — deterministic stand-in for the real media decoder.
    * Real implementation would decode `payload` with an image/audio codec
    * (not available in this container); the fake derives a fixed-width
    * feature vector from the payload bytes so the pipeline shape (binary in,
    * float vector out, batch-parallel) is fully exercised. */
  private def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (payload.length == 0) return out // undecodable -> zero features
    var i = 0
    while (i < dim) {
      out(i) = ((payload(i % payload.length) & 0xff) - 128) / 128.0f
      i += 1
    }
    out
  }

  /** Partition-batched decode/feature-extract over the payload column.
    * Null/empty payloads (a real corpus always has some) yield an all-zero
    * dim-length feature vector rather than killing the executor — a decode
    * failure must cost one row, never the job. */
  def extractFeatures(withPayload: DataFrame, dim: Int = 8): Dataset[MediaFeatures] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select("doc_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, modality, payloadOrNull) =>
          val payload = if (payloadOrNull == null) Array.empty[Byte] else payloadOrNull
          MediaFeatures(id, modality, payload.length, decodeStub(payload, dim))
        }
      }
  }

  /** Resized payload row produced by the resample kernel. */
  final case class ResizedMedia(
      doc_id: Long,
      modality: String,
      n_bytes_in: Int,
      payload: Array[Byte])

  /** Resize: stride-resample the payload down to at most `targetBytes` —
    * the byte-domain stand-in for image resize / audio downsampling, in the
    * same partition-batched kernel shape the real codec drops into (a
    * payload at or under the target passes through; there is no upscale).
    * Null payloads resize to empty — one bad row must never cost the job. */
  def resize(withPayload: DataFrame, targetBytes: Int): Dataset[ResizedMedia] = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select("doc_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, modality, payloadOrNull) =>
          val p = if (payloadOrNull == null) Array.empty[Byte] else payloadOrNull
          val out =
            if (p.length <= targetBytes) p
            else {
              val o = new Array[Byte](targetBytes)
              var i = 0
              while (i < targetBytes) {
                // stride positions cover the full input span evenly; Long
                // math so huge payloads cannot overflow the index product
                o(i) = p(((i.toLong * p.length) / targetBytes).toInt)
                i += 1
              }
              o
            }
          ResizedMedia(id, modality, p.length, out)
        }
      }
  }

  /** Frame sampling: every k-th byte-chunk of the payload (stand-in for
    * every k-th video frame) — pure Column ops over the binary column
    * (Substring supports BinaryType), no kernel needed. Null/empty payloads
    * sample to an empty frame list (sequence(1, 0) would throw). */
  def frameSample(withPayload: DataFrame, k: Int): DataFrame = {
    // fail here, not per-row inside Spark's sequence() step validation
    require(k >= 1, s"frame-sample stride must be >= 1, got $k")
    withPayload.select(
      col("doc_id"),
      when(coalesce(length(col("payload")), lit(0)) === 0,
        array().cast("array<binary>"))
        .otherwise(
          transform(sequence(lit(1), length(col("payload")), lit(k)),
            i => col("payload").substr(i, lit(1)))).as("frames"))
  }
}
