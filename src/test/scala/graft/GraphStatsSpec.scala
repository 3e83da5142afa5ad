package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.materialize.GraphStats

/** The control-plane schema profile (`KgMain stats` / GraphStats.profile):
  * exact cardinalities, out-degree and functionality on a hand-built edge
  * frame, and end-to-end over a real published edge table. */
class GraphStatsSpec extends AnyFunSuite {

  test("profile: cardinalities, max out-degree and functional flag are exact") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val edges = Seq(
      // p1: functional (every subj has exactly one obj), weights sum
      ("s1", "p1", "a", 2L), ("s2", "p1", "b", 3L),
      // p2: s1 has two objects -> max_out 2, not functional
      ("s1", "p2", "a", 1L), ("s1", "p2", "b", 1L), ("s2", "p2", "a", 1L)
    ).toDF("subj", "pred", "obj", "weight")
    val got = GraphStats.profile(edges).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      ("p1", 2L, 2L, 2L, 1L, 1, 5L),
      ("p2", 3L, 2L, 2L, 2L, 0, 3L)))
  }

  test("profile over a published edge table from a real pipeline run") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val fx = graft.sources.TranscriptGen.generate(nConv = 20, nEnt = 8, hotFactor = 2)
    val dir = java.nio.file.Files.createTempDirectory("stats-").toString
    val p = new graft.pipeline.KgPipeline(
      graft.config.PipelineConfig(workDir = dir, numPartitions = 4))
    p.runFull(spark, fx.turns.toDS(), fx.catalog, fx.markers, "r1")
    val edges = p.edgeTable.read(spark).get
    val prof = GraphStats.profile(edges)
    val rows = prof.collect()
    assert(rows.nonEmpty)
    // totals reconcile with the table itself
    assert(rows.map(_.getLong(1)).sum == edges.count())
    // the mentions predicate always exists and is never functional on a
    // multi-entity corpus
    val mentions = rows.find(_.getString(0) == graft.extract.Extractor.MentionsPred)
    assert(mentions.isDefined)
    assert(mentions.get.getInt(5) == 0)
  }
}
