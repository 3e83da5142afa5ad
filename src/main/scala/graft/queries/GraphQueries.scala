package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Iterative graph analytics over the materialized KG beyond PageRank /
  * connected components / triangles (KgQueries): label-propagation
  * communities, k-core decomposition, and multi-source BFS. These are the
  * standard "analyze the graph you just built" queries a KG-construction
  * pipeline is expected to serve (reference analogue: the dashboard's
  * SPARQL-over-the-built-graph surface, Harvester.java:1547-1659 — the
  * reference hands analysis to a triplestore; here the same graph shapes
  * are first-class Catalyst plans).
  *
  * Determinism discipline (same as kg_pagerank): every iteration works in
  * integer counts/labels with total tie-breaks (count DESC, label ASC; min
  * label; min hops), so Spark and DuckDB agree bit-for-bit — no float
  * accumulation, no RNG. Iteration counts are fixed (3) so the oracle is
  * expressible as unrolled CTEs.
  *
  * Scale shape shared by all three: the edge set is derived once, bounded,
  * and eagerly materialized (localCheckpoint) because every iteration
  * re-reads it; each iteration is one shuffle-on-key aggregation
  * (map-side-combinable ints) plus a hash join — the same per-iteration
  * cost envelope as kg_pagerank, which is the right envelope at 10^12
  * edges (no driver-side state beyond the node count, no cartesian
  * products, no per-iteration lineage growth thanks to the checkpointed
  * base).
  */
object GraphQueries {

  /** Deterministic doc-reference graph (two quadratic/affine generators mod
    * n, self-loops dropped) — same derivation family as kg_pagerank's edge
    * set but denser, so peeling/communities are non-trivial. */
  private val edgesSql =
    """n AS (SELECT count(*) AS cnt FROM documents),
      |e0 AS (SELECT doc_id AS u, (doc_id * doc_id + 7) % (SELECT cnt FROM n) AS v FROM documents
      |       UNION
      |       SELECT doc_id AS u, (3 * doc_id + 11) % (SELECT cnt FROM n) AS v FROM documents),
      |ed AS (SELECT u, v FROM e0 WHERE u <> v),
      |sym AS (SELECT u, v FROM ed UNION SELECT v AS u, u AS v FROM ed)""".stripMargin

  /** Directed edge frame, eagerly materialized: every iterative consumer
    * re-reads it, and at any scale the re-derivation (scan + union +
    * distinct) would otherwise replay per iteration. Only the frame a query
    * actually iterates over is materialized — the BFS query must not pay
    * for the symmetrization it never reads. */
  private def directedEdges(s: SparkSession, d: String,
                            materialize: Boolean = true): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"))
    // node count: the one bounded driver-side scalar (same contract as
    // kg_pagerank's count())
    val cnt = docs.count()
    val ed = docs.select(col("doc_id").as("u"),
        ((col("doc_id") * col("doc_id") + 7) % cnt).as("v"))
      .unionAll(docs.select(col("doc_id").as("u"),
        ((col("doc_id") * 3 + 11) % cnt).as("v")))
      .distinct()
      .filter(col("u") =!= col("v"))
    if (materialize) ed.localCheckpoint(true) else ed
  }

  /** Symmetrized (undirected) edge frame over [[directedEdges]], eagerly
    * materialized for the same per-iteration reuse reason. The directed
    * frame is consumed exactly once here (both union branches fold into
    * one plan), so only the SYMMETRIZED result is checkpointed — a
    * materialized intermediate would cost an extra job plus pinned
    * storage that no consumer reads. */
  private def symmetrizedEdges(s: SparkSession, d: String): DataFrame = {
    val ed = directedEdges(s, d, materialize = false)
    ed.unionAll(ed.select(col("v").as("u"), col("u").as("v")))
      .distinct().localCheckpoint(true)
  }

  /** Synchronous label propagation over a symmetric edge frame (u, v):
    * each round, every node takes the most frequent label among its
    * neighbors, ties to the smallest label. Returns (id, lbl). The argmax
    * is a max over (count, -label) structs — one map-side-combinable agg,
    * not a row_number window, so no per-node sort and no second wide
    * exchange of raw neighbor rows. Differentially tested against a
    * brute-force reference on random graphs (GraphQueriesSpec). */
  def labelPropagate(sym: DataFrame, rounds: Int): DataFrame = {
    var labels = sym.select(col("u").as("id"), col("u").as("lbl")).distinct()
    for (_ <- 1 to rounds) {
      val cnts = sym.join(labels.withColumnRenamed("id", "v"), "v")
        .groupBy("u", "lbl").agg(count(lit(1)).as("cn"))
      // argmax by (cn DESC, lbl ASC) == max of the (cn, -lbl) struct
      labels = cnts.groupBy("u")
        .agg(max(struct(col("cn"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("u").as("id"), (-col("m.nl")).as("lbl"))
    }
    labels
  }

  /** k-core peeling over a symmetric edge frame (u, v) for a fixed number
    * of rounds; returns the surviving edge set. Per round: one degree agg
    * + two LEFT SEMI joins against the (distinct) keeper set — never a
    * row-multiplying inner join against a non-unique side. */
  def kcorePeel(sym: DataFrame, k: Int, rounds: Int): DataFrame = {
    var e = sym
    for (_ <- 1 to rounds) {
      val keep = e.groupBy("u").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("u")
      e = e.join(keep, Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("u", "v"), Seq("v"), "left_semi")
        .select("u", "v")
    }
    e
  }

  /** Multi-source BFS over a directed edge frame (u, v): hop distance from
    * `seeds` (id, h=0) up to `hops`. The frontier frame stays node-bounded
    * because distances merge through min() every round. Returns (id, h). */
  def bfsHops(ed: DataFrame, seeds: DataFrame, hops: Int): DataFrame = {
    var dist = seeds
    for (_ <- 1 to hops) {
      val next = ed.join(dist.withColumnRenamed("id", "u"), "u")
        .groupBy(col("v").as("id")).agg((min(col("h")) + 1).as("h"))
      dist = dist.unionAll(next).groupBy("id").agg(min(col("h")).as("h"))
    }
    dist
  }

  /** Common-neighbor link prediction over a symmetric edge frame (u, v):
    * for node pairs NOT already connected, the shared-neighbor count `cn`,
    * neighbor-set Jaccard, and a fixed-point resource-allocation index
    * `ra_fp` = sum over shared neighbors w of (1000000 div deg(w)) — the
    * RA sum is kept in pure integers because the textbook float
    * sum(1/deg) is addition-order-dependent and so never cross-engine
    * exact. `maxHubDeg` caps the wedge join's hottest key BEFORE the
    * pair join: a degree-D hub would otherwise emit D^2/2 wedges (the
    * same stop-key bound as dd_winnow_overlap's df cap and the LSH band
    * flood filter); capped hubs certify nothing, while Jaccard
    * denominators still use UNCAPPED true degrees. Returns
    * (a, b, cn, ra_fp, jac). */
  def linkPredict(sym: DataFrame, maxHubDeg: Int, minCn: Int): DataFrame = {
    val deg = sym.groupBy("u").agg(count(lit(1)).as("d"))
    // cap prunes the wedge centers BEFORE the quadratic self-join
    val sc = sym.join(deg.filter(col("d") <= maxHubDeg), "u")
      .select(col("u").as("w"), col("v"), col("d").as("dw"))
    val x = sc.select(col("w"), col("v").as("a"), col("dw"))
    val y = sc.select(col("w"), col("v").as("b"))
    val cns = x.join(y, "w").filter(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("cn"), sum(expr("1000000 div dw")).as("ra_fp"))
      .filter(col("cn") >= minCn)
    // sym is symmetric, so one directed probe decides edge existence
    val nw = cns.join(sym.select(col("u").as("a"), col("v").as("b")),
      Seq("a", "b"), "left_anti")
    nw.join(deg.select(col("u").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("u").as("b"), col("d").as("db")), "b")
      .withColumn("jac",
        col("cn").cast("double") / (col("da") + col("db") - col("cn")))
      .select("a", "b", "cn", "ra_fp", "jac")
      .orderBy("a", "b")
  }

  /** Fixed-round Bellman-Ford over a directed weighted edge frame
    * (u, v, w: integer): dist(v) <- min(dist(v), dist(u) + w) each round,
    * from `seeds` (id, dist=0). Same per-round envelope as [[bfsHops]]
    * (one hash join + one min-combine agg, node-bounded state) — weights
    * change nothing about the shuffle shape, only the merge value.
    * Returns (id, dist). */
  def bellmanFord(ew: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    var dist = seeds
    for (_ <- 1 to rounds) {
      val relax = ew.join(dist.withColumnRenamed("id", "u"), "u")
        .groupBy(col("v").as("id")).agg(min(col("dist") + col("w")).as("dist"))
      dist = dist.unionAll(relax).groupBy("id").agg(min(col("dist")).as("dist"))
    }
    dist
  }

  val all: Map[String, Q] = Map(

    // ---- community detection: synchronous label propagation, 3 rounds.
    // new_label(v) = most frequent label among v's neighbors, ties to the
    // smallest label. Per round: one shuffle agg on (node, label) + one
    // map-side-combinable argmax agg on node — the argmax is a max over
    // (count, -label) structs, NOT a row_number window, so no per-node sort
    // and no second wide exchange of raw neighbor rows.
    "kg_label_prop" -> Q(
      s"""WITH $edgesSql,
         |l0 AS (SELECT DISTINCT u AS id, u AS lbl FROM sym),
         |c1 AS (SELECT s.u, l.lbl, count(*) AS cn FROM sym s JOIN l0 l ON s.v = l.id GROUP BY 1, 2),
         |l1 AS (SELECT u AS id, lbl FROM (
         |  SELECT u, lbl, row_number() OVER (PARTITION BY u ORDER BY cn DESC, lbl) AS rn FROM c1) WHERE rn = 1),
         |c2 AS (SELECT s.u, l.lbl, count(*) AS cn FROM sym s JOIN l1 l ON s.v = l.id GROUP BY 1, 2),
         |l2 AS (SELECT u AS id, lbl FROM (
         |  SELECT u, lbl, row_number() OVER (PARTITION BY u ORDER BY cn DESC, lbl) AS rn FROM c2) WHERE rn = 1),
         |c3 AS (SELECT s.u, l.lbl, count(*) AS cn FROM sym s JOIN l2 l ON s.v = l.id GROUP BY 1, 2),
         |l3 AS (SELECT u AS id, lbl FROM (
         |  SELECT u, lbl, row_number() OVER (PARTITION BY u ORDER BY cn DESC, lbl) AS rn FROM c3) WHERE rn = 1)
         |SELECT id, lbl AS community FROM l3 ORDER BY id""".stripMargin) { (s, d) =>
      labelPropagate(symmetrizedEdges(s, d), rounds = 3)
        .select(col("id"), col("lbl").as("community")).orderBy("id")
    },

    // ---- k-core decomposition: peel nodes of degree < 3 for 3 rounds and
    // report the surviving subgraph's degrees. Per round: one degree agg
    // (map-side combinable) + two LEFT SEMI joins against the (distinct)
    // keeper set — never a row-multiplying inner join against a non-unique
    // side.
    "kg_kcore" -> Q(
      s"""WITH $edgesSql,
         |d1 AS (SELECT u, count(*) AS d FROM sym GROUP BY u),
         |k1 AS (SELECT u FROM d1 WHERE d >= 3),
         |e1 AS (SELECT e.u, e.v FROM sym e JOIN k1 a ON e.u = a.u JOIN k1 b ON e.v = b.u),
         |d2 AS (SELECT u, count(*) AS d FROM e1 GROUP BY u),
         |k2 AS (SELECT u FROM d2 WHERE d >= 3),
         |e2 AS (SELECT e.u, e.v FROM e1 e JOIN k2 a ON e.u = a.u JOIN k2 b ON e.v = b.u),
         |d3 AS (SELECT u, count(*) AS d FROM e2 GROUP BY u),
         |k3 AS (SELECT u FROM d3 WHERE d >= 3),
         |e3 AS (SELECT e.u, e.v FROM e2 e JOIN k3 a ON e.u = a.u JOIN k3 b ON e.v = b.u)
         |SELECT u AS id, count(*) AS deg FROM e3 GROUP BY u ORDER BY id""".stripMargin) { (s, d) =>
      kcorePeel(symmetrizedEdges(s, d), k = 3, rounds = 3)
        .groupBy(col("u").as("id")).agg(count(lit(1)).as("deg")).orderBy("id")
    },

    // ---- multi-source BFS, 3 hops over the DIRECTED edge set: hop
    // distance from the seed set (doc_id % 53 == 1). Per hop: one hash
    // join frontier->edges + one min-combine agg; the frontier frame stays
    // node-bounded because distances merge through min() every round
    // (no exponential path blowup).
    "kg_bfs_hops" -> Q(
      s"""WITH $edgesSql,
         |b0 AS (SELECT doc_id AS id, CAST(0 AS BIGINT) AS h FROM documents WHERE doc_id % 53 = 1),
         |c1 AS (SELECT e.v AS id, min(b.h) + 1 AS h FROM ed e JOIN b0 b ON e.u = b.id GROUP BY e.v),
         |b1 AS (SELECT id, min(h) AS h FROM (SELECT * FROM b0 UNION ALL SELECT * FROM c1) GROUP BY id),
         |c2 AS (SELECT e.v AS id, min(b.h) + 1 AS h FROM ed e JOIN b1 b ON e.u = b.id GROUP BY e.v),
         |b2 AS (SELECT id, min(h) AS h FROM (SELECT * FROM b1 UNION ALL SELECT * FROM c2) GROUP BY id),
         |c3 AS (SELECT e.v AS id, min(b.h) + 1 AS h FROM ed e JOIN b2 b ON e.u = b.id GROUP BY e.v),
         |b3 AS (SELECT id, min(h) AS h FROM (SELECT * FROM b2 UNION ALL SELECT * FROM c3) GROUP BY id)
         |SELECT id, h AS hops FROM b3 ORDER BY id""".stripMargin) { (s, d) =>
      val ed = directedEdges(s, d)
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val seeds = docs.filter(col("doc_id") % 53 === 1)
        .select(col("doc_id").as("id"), lit(0L).as("h"))
      bfsHops(ed, seeds, hops = 3)
        .select(col("id"), col("h").as("hops")).orderBy("id")
    },

    // ---- link prediction: common-neighbor count, integer fixed-point
    // resource-allocation index, neighbor-set Jaccard — for pairs NOT yet
    // connected, hub wedges capped at deg <= 32 — see linkPredict's
    // scaladoc for the scale bound
    "kg_link_predict" -> Q(
      s"""WITH $edgesSql,
         |deg AS (SELECT u, count(*) AS d FROM sym GROUP BY u),
         |sc AS (SELECT s.u AS w, s.v, g.d AS dw
         |       FROM sym s JOIN deg g ON s.u = g.u WHERE g.d <= 32),
         |cns AS (SELECT x.v AS a, y.v AS b, count(*) AS cn,
         |               CAST(sum(1000000 // x.dw) AS BIGINT) AS ra_fp
         |        FROM sc x JOIN sc y ON x.w = y.w AND x.v < y.v
         |        GROUP BY 1, 2 HAVING count(*) >= 2),
         |nw AS (SELECT * FROM cns WHERE NOT EXISTS
         |        (SELECT 1 FROM sym WHERE sym.u = cns.a AND sym.v = cns.b))
         |SELECT a, b, cn, ra_fp, CAST(cn AS DOUBLE) / (da.d + db.d - cn) AS jac
         |FROM nw JOIN deg da ON nw.a = da.u JOIN deg db ON nw.b = db.u
         |ORDER BY a, b""".stripMargin) { (s, d) =>
      linkPredict(symmetrizedEdges(s, d), maxHubDeg = 32, minCn = 2)
    },

    // ---- weighted shortest paths: 4 Bellman-Ford rounds over the directed
    // edge set with deterministic integer weights w = (u + v) % 7 + 1,
    // seeded like kg_bfs_hops; per round one hash join + one min-combine
    "kg_weighted_paths" -> Q(
      s"""WITH $edgesSql,
         |ew AS (SELECT u, v, (u + v) % 7 + 1 AS w FROM ed),
         |b0 AS (SELECT doc_id AS id, CAST(0 AS BIGINT) AS dist FROM documents WHERE doc_id % 53 = 1),
         |c1 AS (SELECT e.v AS id, min(b.dist + e.w) AS dist FROM ew e JOIN b0 b ON e.u = b.id GROUP BY e.v),
         |b1 AS (SELECT id, min(dist) AS dist FROM (SELECT * FROM b0 UNION ALL SELECT * FROM c1) GROUP BY id),
         |c2 AS (SELECT e.v AS id, min(b.dist + e.w) AS dist FROM ew e JOIN b1 b ON e.u = b.id GROUP BY e.v),
         |b2 AS (SELECT id, min(dist) AS dist FROM (SELECT * FROM b1 UNION ALL SELECT * FROM c2) GROUP BY id),
         |c3 AS (SELECT e.v AS id, min(b.dist + e.w) AS dist FROM ew e JOIN b2 b ON e.u = b.id GROUP BY e.v),
         |b3 AS (SELECT id, min(dist) AS dist FROM (SELECT * FROM b2 UNION ALL SELECT * FROM c3) GROUP BY id),
         |c4 AS (SELECT e.v AS id, min(b.dist + e.w) AS dist FROM ew e JOIN b3 b ON e.u = b.id GROUP BY e.v),
         |b4 AS (SELECT id, min(dist) AS dist FROM (SELECT * FROM b3 UNION ALL SELECT * FROM c4) GROUP BY id)
         |SELECT id, dist FROM b4 ORDER BY id""".stripMargin) { (s, d) =>
      val ew = directedEdges(s, d)
        .withColumn("w", (col("u") + col("v")) % 7 + 1)
      val seeds = Tables.documents(s, d).select(col("doc_id"))
        .filter(col("doc_id") % 53 === 1)
        .select(col("doc_id").as("id"), lit(0L).as("dist"))
      bellmanFord(ew, seeds, rounds = 4)
        .select("id", "dist").orderBy("id")
    }
  )
}
