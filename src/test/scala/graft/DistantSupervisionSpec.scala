package graft

import org.scalatest.funsuite.AnyFunSuite

/** kg_rel_pairs semantics, checked against a single-threaded reference
  * rebuilt from the raw documents table: Mintz-style weak labeling means
  * every emitted (subj, pred, obj) example is grounded in its turn — both
  * entities rank-1-linked from the turn's own tokens, the predicate cue
  * present in the turn, pairs canonically ordered, the text fingerprint the
  * turn's md5 — and COMPLETE: a turn with k>=2 mentions and >=1 predicate
  * cue contributes exactly C(k,2) examples, no more, no fewer. The driver's
  * DuckDB oracle re-derives the same set in SQL; this spec re-derives it in
  * plain Scala so a simultaneous bug in both declarative formulations can't
  * hide. Dictionary constants are duplicated here deliberately: they are
  * fixture contracts shared with the oracle SQL, so drifting them must fail
  * a test, not silently re-pin the oracle.
  */
class DistantSupervisionSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  // rank-1 winners of KgQueries.aliasEntities (first-match-wins, W3)
  private val winners = Map(
    "spark" -> "urn:ent:00001", "table" -> "urn:ent:00002",
    "query" -> "urn:ent:00003", "vector" -> "urn:ent:00004",
    "stream" -> "urn:ent:00005", "hash" -> "urn:ent:00006")

  private val termPreds = Map(
    "spark" -> "urn:p:tech", "table" -> "urn:p:artifact",
    "query" -> "urn:p:op", "join" -> "urn:p:op", "window" -> "urn:p:op",
    "stream" -> "urn:p:artifact", "vector" -> "urn:p:artifact",
    "hash" -> "urn:p:op", "merge" -> "urn:p:op", "filter" -> "urn:p:op")

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("pairs are grounded, canonical, fingerprinted, and complete") {
    val spark = SparkTestSession.get
    val got = SparkEntry.queries("kg_rel_pairs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4)))
    assert(got.nonEmpty, "fixture must produce training pairs")

    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    // single-threaded reference over the raw table
    val want = docs.toSeq.flatMap { case (id, text) =>
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
      val ments = toks.flatMap(winners.get).toSeq.sorted
      val cues = toks.flatMap(termPreds.get)
      if (ments.size >= 2 && cues.nonEmpty) {
        val pred = cues.min
        val fp = md5Hex(text)
        for (i <- ments.indices; j <- (i + 1) until ments.size)
          yield (id, ments(i), pred, ments(j), fp)
      } else Nil
    }.toSet

    assert(got.toSet == want,
      s"rel-pairs mismatch: got=${got.length} want=${want.size}")
    // canonical ordering of the emitted frame itself
    assert(got.sortBy(r => (r._1, r._2, r._4)).toSeq == got.toSeq,
      "output must be ordered by (doc_id, subj, obj)")
  }
}
