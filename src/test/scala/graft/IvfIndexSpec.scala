package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.similarity.IvfIndex

class IvfIndexSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.01"

  test("IVF top-k recall vs brute force; full probing is exact") {
    val spark = SparkTestSession.get
    val vectors = Tables.embeddings(spark, sf)
    val queries = vectors.filter(col("vec_id") < 20)

    val model = IvfIndex.train(spark, vectors, k = 16, iters = 2)
    assert(model.k == 16)
    val assigned = IvfIndex.assign(vectors, model).persist()
    // every vector lands in exactly one bucket
    assert(assigned.count() == vectors.count())
    assert(assigned.select("bucket").distinct().count() <= 16)

    def neighbors(nProbe: Int): Map[Long, Seq[Long]] =
      IvfIndex.topK(assigned, queries, model, k = 5, nProbe = nProbe)
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }

    val brute = SparkEntry.queries("ann_topk_brute")(spark, sf)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }

    // probing every bucket is exact brute force
    val full = neighbors(nProbe = 16)
    assert(full == brute)

    // partial probing trades recall for a fraction of the work
    val partial = neighbors(nProbe = 6)
    val recall = brute.keys.toSeq.map { q =>
      partial.getOrElse(q, Seq.empty).toSet.intersect(brute(q).toSet).size / 5.0
    }.sum / brute.size
    info(f"recall@5 with 6/16 probes: $recall%.3f")
    assert(recall >= 0.5, s"recall too low: $recall")
    assigned.unpersist()
  }
}
