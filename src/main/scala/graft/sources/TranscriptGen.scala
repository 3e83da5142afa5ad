package graft.sources

import java.sql.Timestamp

import graft.schema.{CatalogEntry, Triple, Turn}

/** Deterministic synthetic transcript + dictionary + golden-triple generator
  * (FIXTURES.md §2; seed fixed, no external data). Pure Scala — the golden
  * output is computed at plant time, independently of the Spark extractor,
  * so the P/R gate is a real check and not a tautology.
  *
  * Text layout per fact turn: `<alias> <marker> <alias> <filler...>`, where
  * the marker token signals the predicate (the graft analogue of the
  * reference turning SPARQL solution rows into statements,
  * Harvester.java:1561-1581). Noise turns contain neither aliases nor
  * markers. Stress turns append `parseForJson` stress characters
  * (EEASettings.java:56-63) that the cleaning stage must normalize without
  * disturbing extraction.
  */
object TranscriptGen {

  final case class Fixture(
      turns: Seq[Turn],
      catalog: Seq[CatalogEntry],
      markers: Map[String, String],
      goldenTriples: Set[Triple],
      goldenComponents: Map[String, String])

  private val fillers = Vector("lorem", "ipsum", "dolor", "sit", "amet",
    "consectetur", "adipiscing", "elit", "sed", "do", "eiusmod", "tempor")

  private val roles = Vector("user", "assistant", "tool")

  val markerPreds: Map[String, String] = Map(
    "collaborates" -> "urn:p:collab",
    "uses" -> "urn:p:uses",
    "criticizes" -> "urn:p:crit")

  val MentionsPred = "urn:p:mentions"

  def entityId(i: Int): String = f"urn:ent:$i%05d"

  /** Entity catalog with deliberate alias collisions: `shared<g>` maps to
    * entities 10g (rank 1) and 10g+1 (rank 2) — linking must pick rank 1,
    * canonicalization must merge the pair (both reachable via the alias).
    * Every 5th entity also carries a multi-token alias (`mt<i> unit`) to
    * exercise the extractor's longest-match trie scan. */
  def catalog(nEnt: Int): Seq[CatalogEntry] = {
    val base = (0 until nEnt).flatMap { i =>
      val multi =
        if (i % 5 == 0) Seq(CatalogEntry(entityId(i), s"mt$i unit", s"entity$i", 1))
        else Seq.empty
      Seq(
        CatalogEntry(entityId(i), s"al${i}x", s"entity$i", 1),
        CatalogEntry(entityId(i), s"al${i}y", s"entity$i", 1)) ++ multi
    }
    val shared = (0 until nEnt / 10).flatMap { g =>
      val a = 10 * g
      val b = 10 * g + 1
      if (b < nEnt)
        Seq(
          CatalogEntry(entityId(a), s"shared$g", s"entity$a", 1),
          CatalogEntry(entityId(b), s"shared$g", s"entity$b", 2))
      else Nil
    }
    base ++ shared
  }

  /** Union-find over alias-sharing: the golden canonical id per entity. */
  def components(cat: Seq[CatalogEntry]): Map[String, String] = {
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: String, b: String): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    cat.groupBy(_.alias).values.foreach { es =>
      es.sliding(2).foreach {
        case Seq(x, y) => union(x.entityId, y.entityId)
        case _ =>
      }
    }
    val ids = cat.map(_.entityId).distinct
    // path-compress to the true min of each component
    val byRoot = ids.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min
      members.map(_ -> m)
    }
  }

  /** Rank-1-first (then min entity id) resolution of an alias — the
    * first-match-wins label priority (W3, ESNormalizer.java:417-455). */
  def resolveAlias(cat: Seq[CatalogEntry]): Map[String, String] =
    cat.groupBy(_.alias).map { case (a, es) =>
      a -> es.minBy(e => (e.rank, e.entityId)).entityId
    }

  /** Precomputed per-partition generation context (catalog-derived lookup
    * maps hoisted out of the per-conversation loop). */
  final case class GenCtx(nEnt: Int, hotFactor: Int, lang: String, seed: Long,
      resolve: Map[String, String], canon: Map[String, String],
      aliasesOf: Map[String, Seq[String]], markerKeys: Vector[String])

  def mkCtx(nEnt: Int, hotFactor: Int, lang: String, seed: Long,
            cat: Seq[CatalogEntry]): GenCtx =
    GenCtx(nEnt, hotFactor, lang, seed, resolveAlias(cat), components(cat),
      cat.groupBy(_.entityId).map { case (e, es) => e -> es.map(_.alias).sorted },
      markerPreds.keys.toVector.sorted)

  def convData(c: Int, ctx: GenCtx): (Seq[Turn], Set[Triple]) = {
    import ctx._
    val rnd = new scala.util.Random(seed ^ (c.toLong * 0x9E3779B97F4A7C15L))
    val baseTs = 1700000000000L // fixed epoch millis (UTC)

    val convId = f"conv-$c%06d"
    val turns = Vector.newBuilder[Turn]
    val golden = Set.newBuilder[Triple]
    val nTurns = (if (c == 0) hotFactor else 1) * (5 + rnd.nextInt(10))
    (0 until nTurns).foreach { t =>
      val role = roles(t % 3)
      val tool = if (role == "tool") s"tool${t % 4}" else null
      // turn-major timestamps: later turn_idx is globally later, so an
      // event-time watermark cleanly separates "old" from "appended" turns
      val ts = new Timestamp(baseTs + t * 100000L + c * 10L)
      val kind = rnd.nextInt(10)
      val filler = Seq.fill(3 + rnd.nextInt(5))(fillers(rnd.nextInt(fillers.size)))
      if (kind < 6) {
        // fact turn
        val e1 = rnd.nextInt(nEnt)
        val e2 = { val x = rnd.nextInt(nEnt); if (x == e1) (x + 1) % nEnt else x }
        val a1 = { val as = aliasesOf(entityId(e1)); as(rnd.nextInt(as.size)) }
        val a2 = { val as = aliasesOf(entityId(e2)); as(rnd.nextInt(as.size)) }
        val mk = markerKeys(rnd.nextInt(markerKeys.size))
        val stress = kind == 5
        val raw = (Seq(a1, mk, a2) ++ filler).mkString(" ") +
          (if (stress) " tail\"q\ttab\\xAF\\end\nnl" else "")
        turns += Turn(convId, t, role, raw, tool, ts)
        // golden: subject/object resolved by alias rank, then canonicalized
        val s1 = canon(resolve(a1))
        val s2 = canon(resolve(a2))
        golden += Triple(s1, markerPreds(mk), s2, lang, "uri")
        golden += Triple(s"urn:conv:$convId", MentionsPred, s1, lang, "uri")
        golden += Triple(s"urn:conv:$convId", MentionsPred, s2, lang, "uri")
      } else {
        turns += Turn(convId, t, role, filler.mkString(" "), tool, ts)
      }
    }
    (turns.result(), golden.result())
  }

  /** @param nConv   conversations; conv 0 is "hot" with hotFactor x turns
    *                (exercises salting)
    * @param nEnt    catalog size
    * @param lang    language stamped on every golden triple (config default)
    */
  def generate(nConv: Int = 200, nEnt: Int = 50, hotFactor: Int = 50,
               lang: String = "en", seed: Long = 42L): Fixture = {
    val cat = catalog(nEnt)
    val canon = components(cat)
    val ctx = mkCtx(nEnt, hotFactor, lang, seed, cat)
    val parts = (0 until nConv).map(c => convData(c, ctx))
    Fixture(parts.flatMap(_._1), cat, markerPreds,
      parts.iterator.flatMap(_._2).toSet, canon)
  }

  /** Executor-side fixture generation — no driver materialization, scales to
    * arbitrary conversation counts (the 10^12-turn design point generates on
    * the cluster, never ships rows through the driver). Identical rows to
    * `generate` for the same parameters. */
  def generateDistributed(spark: org.apache.spark.sql.SparkSession,
                          nConv: Int, nEnt: Int = 50, hotFactor: Int = 50,
                          lang: String = "en", seed: Long = 42L,
                          partitions: Int = 32): org.apache.spark.sql.Dataset[Turn] = {
    import spark.implicits._
    spark.range(0, nConv, 1, partitions).mapPartitions { it =>
      val ctx = mkCtx(nEnt, hotFactor, lang, seed, catalog(nEnt)) // once per partition
      it.flatMap(c => convData(c.toInt, ctx)._1)
    }
  }
}
