package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DedupQueries

/** Locks dd_winnow_overlap's contract three ways:
  *  1. differential — the Spark plan's (pair, shared-count) set equals a
  *     plain-Scala reimplementation of 0-mod-p fingerprint selection over
  *     seeded random docs;
  *  2. semantic — a copied passage inside two otherwise-different docs is
  *     detected even though the pair's GLOBAL 3-gram Jaccard is far below
  *     the 0.5 near-dup threshold (the gap the bag-of-shingles family
  *     cannot close);
  *  3. stop-fingerprint cap — boilerplate shared by more docs than maxDf
  *     certifies nothing.
  */
class WinnowOverlapSpec extends AnyFunSuite {

  private def tokens(text: String): Seq[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Independent reimplementation: distinct per-doc selected fingerprints,
    * df cap, pair counts. */
  private def expected(docs: Seq[(Long, String)], p: Int, maxDf: Int,
                       minShared: Int): Map[(Long, Long), Long] = {
    val sel: Seq[(Long, Long)] = docs.flatMap { case (id, text) =>
      val l = tokens(text)
      if (l.size < 5) Seq.empty
      else l.sliding(5).map(_.mkString(" "))
        .map(g => java.lang.Long.parseLong(md5hex(g).take(7), 16))
        .filter(_ % p == 0)
        .toSeq.distinct.map(h => (id, h))
    }
    val df = sel.groupBy(_._2).map { case (h, rows) => h -> rows.size }
    val keep = sel.filter { case (_, h) => df(h) <= maxDf }
    val byH = keep.groupBy(_._2)
    byH.values.flatMap { rows =>
      val ids = rows.map(_._1).sorted
      for (i <- ids.indices; j <- (i + 1) until ids.size)
        yield (ids(i), ids(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= minShared)
  }

  private val words = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima", "mike",
    "november", "oscar", "papa", "quebec", "romeo", "sierra", "tango")

  private def randDoc(rng: scala.util.Random, n: Int): String =
    Seq.fill(n)(words(rng.nextInt(words.size))).mkString(" ")

  test("differential vs a plain-Scala 0-mod-p reimplementation on seeded " +
       "random docs (p=2 so selection actually fires at this size)") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val passage = randDoc(rng, 30)
    val docs: Seq[(Long, String)] = (0L until 40L).map { id =>
      // every third doc embeds the shared passage mid-text
      val body =
        if (id % 3 == 0) s"${randDoc(rng, 25)} $passage ${randDoc(rng, 25)}"
        else randDoc(rng, 80)
      (id, body)
    }
    val got = DedupQueries
      .winnowOverlap(docs.toDF("doc_id", "text"), p = 2, maxDf = 50,
        minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected(docs, p = 2, maxDf = 50, minShared = 3))
    assert(got.nonEmpty, "fixture produced no overlapping pairs")
  }

  test("a copied passage is caught at global Jaccard far below the " +
       "near-dup threshold") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val passage = randDoc(rng, 40)
    val a = s"${randDoc(rng, 150)} $passage ${randDoc(rng, 150)}"
    val b = s"${randDoc(rng, 150)} $passage ${randDoc(rng, 150)}"
    val c = randDoc(rng, 340)
    val docs = Seq((1L, a), (2L, b), (3L, c))
    val pairs = DedupQueries
      .winnowOverlap(docs.toDF("doc_id", "text"), p = 2, maxDf = 50,
        minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "shared passage not detected")
    // global 3-gram Jaccard of the detected pair is nowhere near 0.5
    def sh3(t: String) = tokens(t).sliding(3).map(_.mkString(" ")).toSet
    val (sa, sb) = (sh3(a), sh3(b))
    val jac = sa.intersect(sb).size.toDouble / sa.union(sb).size
    assert(jac < 0.2, s"fixture too globally similar (jac=$jac)")
  }

  test("stop-fingerprint cap: boilerplate shared by > maxDf docs is inert") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val boilerplate = randDoc(rng, 40)
    val docs = (0L until 6L).map(id => (id, boilerplate))
    val pairs = DedupQueries
      .winnowOverlap(docs.toDF("doc_id", "text"), p = 1, maxDf = 5,
        minShared = 1)
      .collect()
    assert(pairs.isEmpty,
      "fingerprints with df > maxDf must not certify pairs")
  }
}
