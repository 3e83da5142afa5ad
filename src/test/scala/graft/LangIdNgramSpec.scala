package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextStatsQueries

/** Locks the char-trigram language-ID contract: profile collisions count
  * toward every profile sharing the trigram, ties break lexicographically,
  * signal-free docs land on 'und' with 0 hits. */
class LangIdNgramSpec extends AnyFunSuite {

  test("collision trigram counts for BOTH profiles; tie breaks to the " +
       "lexicographically smaller lang; no-signal doc -> und/0") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val profiles = Seq(
      ("aaa_lang", "sca"), ("aaa_lang", "tab"),
      ("bbb_lang", "sca"), ("bbb_lang", "sor"))
    val docs = Seq(
      // only the shared trigram: both profiles score 2 -> tie -> aaa_lang
      (1L, "sca sca"),
      // shared + bbb-only: bbb_lang wins 3 (2x sca + sor) over aaa's 2
      (2L, "sca sca sort"),
      // aaa-only signal
      (3L, "table table"),
      // no profile trigram at all
      (4L, "zz"))
      .toDF("doc_id", "text")
    val got = TextStatsQueries.langIdNgram(docs, profiles)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == ("aaa_lang", 2L))
    assert(got(2L) == ("bbb_lang", 3L))
    assert(got(3L) == ("aaa_lang", 2L))
    assert(got(4L) == ("und", 0L))
  }

  test("counts are OVERLAPPING occurrences, and the plan is narrow: no " +
       "explode, no join, no aggregation (round-4 CountSubstring rewrite)") {
    val spark = SparkTestSession.get
    import spark.implicits._
    // "aaaa" contains "aaa" at positions 1 and 2 — the positional n-gram
    // definition the DuckDB oracle enumerates; null text lands on und/0
    val docs = Seq((1L, "aaaa"), (2L, null: String)).toDF("doc_id", "text")
    val df = TextStatsQueries.langIdNgram(docs, Seq(("trip_lang", "aaa")))
    val got = df.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == ("trip_lang", 2L), "overlapping occurrences must count")
    assert(got(2L) == ("und", 0L))
    val plan = df.queryExecution.executedPlan.toString
    for (bad <- Seq("Generate", "Join", "HashAggregate", "Window", "Exchange"))
      assert(!plan.contains(bad), s"language-ID must stay narrow, found $bad")
  }

  test("the registered profile fixture really contains a collision (the " +
       "spec above is exercised by the oracle query's own profiles)") {
    val byTri = TextStatsQueries.triProfiles.groupBy(_._2)
    assert(byTri.exists(_._2.map(_._1).distinct.size > 1))
  }
}
