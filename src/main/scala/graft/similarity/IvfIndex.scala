package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.DotProduct.dot

/** IVF (inverted-file) approximate nearest neighbor: a coarse k-means
  * quantizer partitions the corpus into buckets; a query probes only the
  * `nProbe` nearest buckets and brute-forces within them — the classic
  * billion-vector scale path (alongside the sign-LSH variant in
  * `ann_lsh_buckets`).
  *
  * Deterministic by construction: centroids initialize from the k smallest
  * vec_ids and Lloyd iterations are exact DataFrame aggregations, so the
  * index is reproducible run-to-run (no RNG).
  *
  * Scale shape: train = iters x (broadcast-centroid assign kernel + per-dim
  * aggregation); assign = one narrow pass; query = queries x probed buckets
  * equality join (never all-pairs).
  */
object IvfIndex {

  final case class Model(centroids: Seq[(Int, Seq[Double])]) {
    def k: Int = centroids.size
  }

  private def toDouble(v: org.apache.spark.sql.Column) =
    transform(v, x => x.cast("double"))

  /** Nearest-centroid id for a vector column against broadcast centroids
    * (argmin over k codegen'd dot-distances; centroids are unit-normalized
    * so cosine order = dot order). */
  private def bucketCol(model: Model, v: org.apache.spark.sql.Column) = {
    val sims = model.centroids.map { case (cid, c) =>
      struct(dot(v, typedlit(c)).as("sim"), lit(cid).as("cid"))
    }
    // max by (sim, cid): array_max on structs compares fields in order
    array_max(array(sims: _*)).getField("cid")
  }

  private def normalized(vectors: DataFrame): DataFrame =
    vectors.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      // zero-norm guard: 0/0 = NaN would poison a centroid mean, and NaN
      // compares GREATER than every finite sim in struct ordering — one
      // zero embedding (an empty document) would collapse the whole index
      // into the poisoned bucket. Keep the zero vector as-is: it dots to 0
      // with everything and ranks last.
      .withColumn("u",
        when(col("nrm") === 0, col("v"))
          .otherwise(transform(col("v"), x => x / col("nrm"))))
      .select("vec_id", "u")

  /** Train the coarse quantizer with `iters` Lloyd steps. */
  def train(spark: SparkSession, vectors: DataFrame, k: Int,
            iters: Int = 3): Model = {
    val unit = normalized(vectors).persist()
    // deterministic init: the k smallest vec_ids
    var model = Model(
      unit.orderBy("vec_id").limit(k).collect().zipWithIndex.map {
        case (r, i) => i -> r.getSeq[Double](1)
      }.toSeq)
    (1 to iters).foreach { _ =>
      val assigned = unit.withColumn("bucket", bucketCol(model, col("u")))
      // per-dimension mean as ONE vector aggregation (Summarizer.mean):
      // element-wise sums combine map-side, so the exchange carries one
      // dim-length buffer per (partition, bucket) — the posexplode
      // formulation shuffled n x dim scalar rows, a dim-fold inflation of
      // the training shuffle at corpus scale
      import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
      val means = assigned
        .select(col("bucket"), array_to_vector(col("u")).as("uv"))
        .groupBy("bucket")
        .agg(org.apache.spark.ml.stat.Summarizer.mean(col("uv")).as("mv"))
        .select(col("bucket"), vector_to_array(col("mv")).as("c"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
      // keep previous centroid for any emptied bucket; renormalize
      model = Model(model.centroids.map { case (cid, prev) =>
        val c = means.getOrElse(cid, prev)
        val n = math.sqrt(c.map(x => x * x).sum)
        cid -> (if (n == 0) prev else c.map(_ / n))
      })
    }
    unit.unpersist()
    model
  }

  /** One narrow pass: (vec_id, unit vector, bucket). */
  def assign(vectors: DataFrame, model: Model): DataFrame =
    normalized(vectors).withColumn("bucket", bucketCol(model, col("u")))

  /** Top-k cosine neighbors for each query vector, probing the nProbe
    * nearest buckets only. */
  def topK(assigned: DataFrame, queries: DataFrame, model: Model,
           k: Int, nProbe: Int): DataFrame = {
    val qUnit = normalized(queries)
      .select(col("vec_id").as("qid"), col("u").as("qu"))
    // nProbe nearest centroids per query: sort the (sim, cid) struct array
    val probes = model.centroids.map { case (cid, c) =>
      struct((-dot(col("qu"), typedlit(c))).as("negSim"), lit(cid).as("cid"))
    }
    val qWithBuckets = qUnit.withColumn("bucket",
      explode(slice(transform(array_sort(array(probes: _*)),
        p => p.getField("cid")), 1, nProbe)))
    val scored = qWithBuckets
      .join(assigned.select(col("bucket"), col("vec_id").as("nid"), col("u")),
        Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", round(dot(col("qu"), col("u")), 6))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cos")
  }
}
