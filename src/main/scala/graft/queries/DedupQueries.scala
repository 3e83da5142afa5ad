package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextNorm

/** Large-scale training-data deduplication + similarity-search operators over
  * the `documents` / `embeddings` tables: exact hash dedup, n-gram Jaccard,
  * MinHash+LSH banding, SimHash, embedding-cosine near-dup, brute-force ANN
  * top-k, and a sign-LSH bucketed ANN variant (the 100 TB scale path).
  *
  * Cross-engine float discipline: similarity ratios are single double
  * divisions of exact integer counts (bit-identical in any engine); cosine
  * dot products are computed as an ordered left-fold over double-cast floats
  * on both sides and rounded to 6 dp before ranking.
  */
object DedupQueries {

  /** Distinct word-level 3-gram shingles per doc (docs shorter than 3 tokens
    * have none). NOTE two optimization dead ends measured this round and
    * deliberately NOT taken: (a) per-doc dedup via row-local
    * `array_distinct` — over STRING arrays it is an O(n^2) equality scan
    * per row (no hash fast path for non-primitive element types), 10x
    * slower than the distinct exchange it replaced; (b) computing the
    * min-hash family over a row-local array with `transform`/`array_min` —
    * higher-order functions are CodegenFallback (interpreted per element),
    * ~7x slower than the codegen'd explode + min-aggregate kept below. */
  private def shingles(s: SparkSession, d: String,
                       parallelize: Boolean = false): DataFrame = {
    val l = TextNorm.tokensCol(col("text"))
    val base = Tables.documents(s, d)
    // parallelize=true round-robins first — the tokenize + 3-gram concat
    // map work otherwise runs on the single partition a sub-split-size
    // file reads as (guide §2.5; same as simhashDf/winnowOverlap).
    // dd_ngram_jaccard keeps it OFF: its doc_id < 200 filter pushes to the
    // parquet scan, and a repartition in between blocks that pushdown —
    // shingling 25x the docs costs more than the parallelism buys (A/B:
    // 0.46 -> 0.60 s with the exchange, so the scan prune wins there).
    val src = if (parallelize)
      base.repartition(s.sparkContext.defaultParallelism) else base
    src
      .select(col("doc_id"), l.as("l"))
      .filter(size(col("l")) >= 3)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("l")) - 3),
        i => concat_ws(" ",
          element_at(col("l"), i + 1),
          element_at(col("l"), i + 2),
          element_at(col("l"), i + 3)))).as("s"))
      .distinct()
  }

  private val shinglesSql =
    """toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0) AS l
      |         FROM documents),
      |sh AS (SELECT DISTINCT doc_id, l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] AS s
      |       FROM (SELECT doc_id, l, unnest(range(len(l) - 2)) AS i
      |             FROM toks WHERE len(l) >= 3))""".stripMargin

  /** MinHash universal-hash family shared by the Spark query and its DuckDB
    * oracle: h = first 7 hex digits of md5(shingle) as an integer (< 2^28);
    * mh_k = min over shingles of (a_k*h + b_k) mod P. Constants are fixed
    * (Knuth multiplicative seeds), distinct per k, and < P, so every product
    * stays below 2^59 — exact in 64-bit integers on both engines. */
  private[queries] object MinHash {
    val P = 2147483647L // 2^31 - 1 (prime)
    val perms: Seq[(Long, Long)] = (0 until 16).map { k =>
      ((2654435761L * (2 * k + 1)) % P, (1013904223L * (k + 1)) % P)
    }
    val permValuesSql: String = perms.zipWithIndex
      .map { case ((a, b), k) => s"($k, $a, $b)" }.mkString(", ")
  }

  /** 32-bit SimHash signature per doc, shared by dd_simhash and the
    * duplicate-cluster derivation (dd_dup_clusters) so the signature
    * semantics can never drift between them.
    *
    * ONE shuffle, no row inflation: per-doc token dedup is row-local
    * (array_distinct — a doc's tokens never span rows), md5 is computed
    * once per token, and the 32 bit-position sums are 32 parallel
    * map-side-combinable aggregates over the token rows. The textbook
    * (token x bit) crossJoin formulation — which the DuckDB oracle keeps,
    * values are identical — inflates the exchange 32x and needs two more
    * shuffles (global token distinct + per-(doc, j) combine); at sf0.1
    * that was ~10M shuffled rows vs ~300k here. */
  private def simhashDf(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      // round-robin first: the per-token md5 + 32-way partial aggregation
      // otherwise runs on the ONE partition a sub-split-size file reads as
      // (guide §2.5) — the shuffled rows are whole docs, pennies against
      // the per-token map work
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        explode(array_distinct(TextNorm.tokensCol(col("text")))).as("tok"))
      .select(col("doc_id"), md5(col("tok").cast("binary")).as("h"))
    val sgnCols = (0 until 32).map { j =>
      sum(when(col("h").substr(j + 1, 1)
        .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1))
        .as(s"s$j")
    }
    toks.groupBy("doc_id").agg(sgnCols.head, sgnCols.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(j =>
          when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** The matching DuckDB CTE chain: yields `sim(doc_id, simhash)`. */
  private val simhashCtesSql =
    """toks AS (SELECT DISTINCT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0)) AS tok
      |              FROM documents),
      |js AS (SELECT unnest(range(32)) AS j),
      |bits AS (SELECT doc_id, j,
      |           SUM(CASE WHEN substr(md5(tok), CAST(j + 1 AS INT), 1)
      |                IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS sgn
      |         FROM toks CROSS JOIN js WHERE length(tok) > 0 GROUP BY doc_id, j),
      |sim AS (SELECT doc_id,
      |       CAST(SUM(CASE WHEN sgn > 0 THEN CAST(power(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
      |FROM bits GROUP BY doc_id)""".stripMargin

  /** Native codegen'd dot product (graft.functions.DotProduct): a tight
    * left-to-right loop inside whole-stage codegen — bit-identical to a
    * sequential fold and to the DuckDB oracle's list_dot_product, and ~10x
    * faster than the interpreted lambda `aggregate` on the O(n^2) join. */
  private def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot(a, b)

  /** LOCAL substring-overlap near-dup (Manber-style "0 mod p" fingerprint
    * selection; Manber 1994, and the windowed variant in Schleimer/
    * Wilkerson/Aiken's winnowing, SIGMOD 2003): two docs are related when
    * they share >= `minShared` selected token-5-gram fingerprints — i.e.
    * a copied PASSAGE — even when their global shingle-set Jaccard is far
    * below any near-dup threshold. The bag-of-shingles family
    * (dd_ngram_jaccard / dd_minhash_lsh / dd_simhash) cannot see this:
    * a 40-token quote inside two otherwise-different 400-token docs is
    * ~10% Jaccard but a certain local duplicate.
    *
    * Scale shape, in stage order:
    *  1. 5-gram + hash is a narrow map (one md5 per position, the
    *     MinHash 28-bit digest-prefix idiom);
    *  2. `h % p = 0` SELECTION runs BEFORE any exchange, cutting the
    *     shuffled volume to ~1/p of token positions (selection is content-
    *     keyed, so the same passage selects the same fingerprints in every
    *     doc — no alignment needed);
    *  3. the stop-fingerprint cap (df <= maxDf) bounds the pair join's
    *     hottest key: boilerplate shared by hundreds of docs can never
    *     certify a pairwise overlap, and without the cap it makes the
    *     equality join quadratic in its hottest fingerprint — the same
    *     reason the LSH path filters band floods;
    *  4. pairs = fingerprint-equality join (never all-pairs) + one
    *     map-side-combinable count per (a, b).
    * At 100 TB, p trades recall floor (shortest detectable overlap
    * ~ p + w tokens) against shuffle volume; winnowing's window-minimum
    * selection adds a max-gap guarantee at the cost of a positional
    * window — the 0-mod-p form keeps selection row-local and engine-exact.
    */
  def winnowOverlap(docs: DataFrame, p: Int = 8, maxDf: Int = 50,
                    minShared: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = TextNorm.tokensCol(col("text"))
    // 5-gram build, hash, 0-mod-p selection AND per-doc dedup all ROW-LOCAL
    // (a doc's fingerprints never span rows): the former exploded
    // `.distinct()` paid a global exchange for a per-doc set (guide §2.4).
    // array_distinct here runs over LONG arrays — the hash-set fast path —
    // unlike string arrays, where it degrades to an O(n^2) scan. The scan
    // is round-robined first so the md5-heavy row-local stage does not run
    // on the single partition a sub-split-size file reads as (guide §2.5).
    val sel = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), l.as("l"))
      .filter(size(col("l")) >= 5)
      .select(col("doc_id"), transform(
        sequence(lit(0), size(col("l")) - 5),
        i => concat_ws(" ", (1 to 5).map(j => element_at(col("l"), i + j)): _*))
        .as("g"))
      .select(col("doc_id"), explode(array_distinct(filter(
        transform(col("g"), x =>
          conv(substring(md5(x.cast("binary")), 1, 7), 16, 10).cast("long")),
        h => h % p === 0))).as("h"))
    // stop-fingerprint df cap attaches as a WINDOW count over h — one
    // exchange, no groupBy+join pair; the pair join on h then REUSES the
    // window's hash partitioning (both sides are the same subplan), so the
    // join adds no exchange of its own
    val keep = sel
      .withColumn("df", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("df") <= maxDf)
      .select("doc_id", "h")
    val x = keep.select(col("doc_id").as("a"), col("h"))
    val y = keep.select(col("doc_id").as("b"), col("h"))
    x.join(y, "h").filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select("a", "b", "shared")
      .orderBy("a", "b")
  }

  val all: Map[String, Q] = Map(

    // ---- exact dedup: content-hash groupBy, keep min id per group
    "dd_exact_hash" -> Q(
      """SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY h""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text").cast("binary")).as("h"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
        .orderBy("h")
    },

    // ---- n-gram Jaccard near-dup: candidate pairs via shared-shingle
    // equality join (never a cross join), verified Jaccard >= 0.5.
    // Restricted to doc_id < 200 to bound the oracle's pair blow-up; the
    // MinHash/LSH query below is the unrestricted scale path.
    "dd_ngram_jaccard" -> Q(
      s"""WITH $shinglesSql,
         |shs AS (SELECT * FROM sh WHERE doc_id < 200),
         |sz AS (SELECT doc_id, count(*) AS n FROM shs GROUP BY doc_id),
         |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
         |          FROM shs x JOIN shs y ON x.s = y.s AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2)
         |SELECT a, b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jac
         |FROM inter JOIN sz sa ON inter.a = sa.doc_id
         |           JOIN sz sb ON inter.b = sb.doc_id
         |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
         |ORDER BY a, b""".stripMargin) { (s, d) =>
      val sh = shingles(s, d).filter(col("doc_id") < 200)
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val x = sh.toDF("a", "s")
      val y = sh.toDF("b", "s")
      val inter = x.join(y, "s").filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("i"))
      inter
        .join(sz.toDF("a", "na"), "a")
        .join(sz.toDF("b", "nb"), "b")
        .withColumn("jac", col("i").cast("double") / (col("na") + col("nb") - col("i")))
        .filter(col("jac") >= 0.5)
        .select("a", "b", "jac")
        .orderBy("a", "b")
    },

    // ---- MinHash + LSH banding: ONE md5 per shingle -> 28-bit integer h,
    // then 16 linear permutations (a_k*h + b_k) mod P — the classic
    // universal-hash minhash family. The naive formulation hashes every
    // shingle 16 times; here the k permutations are integer arithmetic over
    // one digest, a 16x reduction of the dominant stage's hash cost at
    // corpus scale. Constants are inlined identically into the DuckDB
    // oracle, so candidate sets (and thus output rows) stay engine-exact
    // (bounds: a_k < P < 2^31, h < 2^28 -> products < 2^59, overflow-safe
    // in both engines' 64-bit ints). 4 bands of 4 (P[candidate] =
    // 1-(1-j^4)^4 — sharp enough that sf0.1's small shared vocabulary does
    // not flood the candidate set); candidates = band-signature equality
    // join; verified Jaccard >= 0.3.
    //
    // Scale shape: candidate generation is a band-bucket equality join
    // (never all-pairs); verification restricts shingles to candidate docs
    // FIRST (semi-join), then intersects per-doc sorted shingle arrays with
    // array_intersect — one row per candidate pair instead of a
    // (pairs x shingles) explode. No persist: shingling is a narrow map over
    // `documents`, recomputing it for the candidate subset is cheaper than
    // caching the full shingle table across the sweep.
    "dd_minhash_lsh" -> Q(
      s"""WITH $shinglesSql,
         |perm(k, a, b) AS (VALUES ${MinHash.permValuesSql}),
         |hh AS (SELECT doc_id,
         |              CAST(CONCAT('0x', substr(md5(s), 1, 7)) AS BIGINT) AS h
         |       FROM sh),
         |mh AS (SELECT doc_id, k, min((a * h + b) % ${MinHash.P}) AS mh
         |       FROM hh CROSS JOIN perm GROUP BY doc_id, k),
         |bands AS (SELECT doc_id, k // 4 AS band,
         |                 md5(string_agg(CAST(mh AS VARCHAR), '|' ORDER BY k)) AS sig
         |          FROM mh GROUP BY doc_id, k // 4),
         |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |         FROM bands x JOIN bands y
         |           ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT c.a, c.b, count(*) AS i
         |          FROM cand c JOIN sh x ON x.doc_id = c.a JOIN sh y ON y.doc_id = c.b AND x.s = y.s
         |          GROUP BY c.a, c.b)
         |SELECT a, b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jac
         |FROM inter JOIN sz sa ON inter.a = sa.doc_id
         |           JOIN sz sb ON inter.b = sb.doc_id
         |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.3
         |ORDER BY a, b""".stripMargin) { (s, d) =>
      val sh = shingles(s, d, parallelize = true)
      // one digest per shingle; all 16 permuted min-hashes in ONE
      // aggregation pass (no x16 row blow-up; arithmetic identical to the
      // oracle's perm VALUES — see MinHash). This stays the exploded
      // codegen'd aggregate: the row-local transform/array_min variant was
      // measured 7x SLOWER (interpreted higher-order functions; see
      // shingles' scaladoc)
      val h = conv(substring(md5(col("s").cast("binary")), 1, 7), 16, 10)
        .cast("long")
      val hh = sh.select(col("doc_id"), h.as("h"))
      val mhCols = MinHash.perms.zipWithIndex.map { case ((a, b), k) =>
        min((lit(a) * col("h") + lit(b)) % lit(MinHash.P)).as(s"mh$k")
      }
      val mh = hh.groupBy("doc_id").agg(mhCols.head, mhCols.tail: _*)
      // bands of 4: sig = md5(mh_{4b} || "|" || ... || mh_{4b+3}); all 4
      // bands exploded from ONE pass over the aggregate (a 4-way union would
      // recompute the aggregation per branch)
      val bandStructs = (0 until 4).map { b =>
        struct(lit(b).as("band"),
          md5(concat_ws("|",
            (0 until 4).map(i => col(s"mh${4 * b + i}").cast("string")): _*)
            .cast("binary")).as("sig"))
      }
      val bands = mh
        .select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
        .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
      val cand = bands.toDF("a", "band", "sig")
        .join(bands.toDF("b", "band", "sig"), Seq("band", "sig"))
        .filter(col("a") < col("b"))
        .select("a", "b").distinct()
      // verification: only candidate docs' shingles matter — semi-join the
      // doc set down before any per-shingle work, then one array per
      // doc and an array_intersect per candidate pair
      val candDocs = cand.select(col("a").as("doc_id"))
        .union(cand.select(col("b").as("doc_id"))).distinct()
      val docSets = shingles(s, d, parallelize = true)
        .join(candDocs, Seq("doc_id"), "left_semi")
        .groupBy("doc_id")
        .agg(collect_list(col("s")).as("arr"), count(lit(1)).as("n"))
      cand
        .join(docSets.select(col("doc_id").as("a"), col("arr").as("arr_a"),
          col("n").as("na")), Seq("a"))
        .join(docSets.select(col("doc_id").as("b"), col("arr").as("arr_b"),
          col("n").as("nb")), Seq("b"))
        .withColumn("i", size(array_intersect(col("arr_a"), col("arr_b"))))
        .withColumn("jac", col("i").cast("double") / (col("na") + col("nb") - col("i")))
        .filter(col("jac") >= 0.3)
        .select("a", "b", "jac")
        .orderBy("a", "b")
    },

    // ---- SimHash: 32-bit signature from per-token md5 hex-digit high bits;
    // identical signatures = near-dup bucket
    "dd_simhash" -> Q(
      s"""WITH $simhashCtesSql
         |SELECT doc_id, simhash FROM sim ORDER BY doc_id""".stripMargin) { (s, d) =>
      simhashDf(s, d).orderBy("doc_id")
    },

    // ---- duplicate CLUSTERS: the end of the dedup story — near-dup
    // RELATIONS (order-insensitive fingerprint equality + SimHash signature
    // equality) unioned into an edge set and closed transitively with the
    // same large-star/small-star connected-components operator the KG
    // canonicalization uses, yielding one cluster id (= min member) per
    // duplicated doc. A doc bridging a fingerprint group and a SimHash
    // group merges them — exactly what per-relation GROUP BYs cannot do.
    // Scale shape: each relation contributes STAR edges (doc -> group min),
    // so the edge count is node-bounded, never group-quadratic; CC is
    // O(log n) rounds of shuffle-agg + join (ConnectedComponents scaladoc).
    "dd_dup_clusters" -> Q(
      s"""WITH RECURSIVE $simhashCtesSql,
         |fp AS (SELECT doc_id, md5(coalesce(array_to_string(list_sort(list_distinct(
         |         list_filter(string_split_regex(lower(text), '\\s+'), x -> length(x) > 0))), ' '), '')) AS k
         |       FROM documents),
         |fpg AS (SELECT k, min(doc_id) AS m FROM fp GROUP BY k HAVING count(*) > 1),
         |simg AS (SELECT simhash, min(doc_id) AS m FROM sim GROUP BY simhash HAVING count(*) > 1),
         |edges AS (
         |  SELECT f.doc_id AS u, g.m AS v FROM fp f JOIN fpg g ON f.k = g.k WHERE f.doc_id <> g.m
         |  UNION
         |  SELECT s.doc_id AS u, g.m AS v FROM sim s JOIN simg g ON s.simhash = g.simhash WHERE s.doc_id <> g.m),
         |sym AS (SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges),
         |nodes AS (SELECT DISTINCT u AS id FROM sym),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT reach.id, sym.v FROM reach JOIN sym ON reach.r = sym.u),
         |comp AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id)
         |SELECT id AS doc_id, cluster,
         |       count(*) OVER (PARTITION BY cluster) AS cluster_size
         |FROM comp ORDER BY doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // star edges of one equality relation keyed by `k`: doc -> group min.
      // Group min + group count attach as TWO functions over ONE window —
      // a single exchange, vs the former groupBy + join pair (guide §2.4;
      // same idiom as the CC round body)
      def stars(keyed: DataFrame): DataFrame = {
        val w = Window.partitionBy("k")
        keyed
          .withColumn("m", min(col("doc_id")).over(w))
          .withColumn("c", count(lit(1)).over(w))
          .filter(col("c") > 1 && col("doc_id") =!= col("m"))
          .select(col("doc_id").as("src"), col("m").as("dst"))
      }
      val fp = Tables.documents(s, d).select(col("doc_id"),
        TextNorm.fingerprintCol(col("text")).as("k"))
      val sim = simhashDf(s, d).withColumnRenamed("simhash", "k")
      // the distinct LOOKS redundant (CC's canonical hi->lo form dedups in
      // its own exchange) but removing it measured consistently SLOWER in
      // interleaved min-of-3 A/B at sf0.1 (5.9/7.7 s with vs 6.9/10.0 s
      // without): the extra exchange gives AQE a materialized stage whose
      // stats shape the CC rounds. Deliberate.
      val edges = stars(fp).unionAll(stars(sim)).distinct()
      val comp = graft.canon.ConnectedComponents.run(edges)
      comp.select(col("id").as("doc_id"), col("component").as("cluster"),
          count(lit(1)).over(Window.partitionBy("component")).as("cluster_size"))
        .orderBy("doc_id")
    },

    // ---- LOCAL substring overlap (copied passages): 0-mod-p selected
    // token-5-gram fingerprints, stop-fingerprint cap, pair count — see
    // winnowOverlap's scaladoc for the algorithm and the scale shape
    "dd_winnow_overlap" -> Q(
      """WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0) AS l
        |              FROM documents),
        |g AS (SELECT DISTINCT doc_id, l[i+1]||' '||l[i+2]||' '||l[i+3]||' '||l[i+4]||' '||l[i+5] AS s
        |      FROM (SELECT doc_id, l, unnest(range(len(l)-4)) AS i FROM toks WHERE len(l) >= 5)),
        |sel AS (SELECT DISTINCT doc_id, CAST(CONCAT('0x', substr(md5(s), 1, 7)) AS BIGINT) AS h
        |        FROM g WHERE CAST(CONCAT('0x', substr(md5(s), 1, 7)) AS BIGINT) % 8 = 0),
        |freq AS (SELECT h, count(*) AS df FROM sel GROUP BY h),
        |keep AS (SELECT sel.doc_id, sel.h FROM sel JOIN freq USING (h) WHERE freq.df <= 50)
        |SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
        |FROM keep x JOIN keep y ON x.h = y.h AND x.doc_id < y.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 3
        |ORDER BY a, b""".stripMargin) { (s, d) =>
      winnowOverlap(Tables.documents(s, d))
    },

    // ---- embedding-cosine near-dup: brute-force pair join (baseline);
    // ordered-fold dot product, 6-dp rounding before the threshold
    "dd_embed_cosine" -> Q(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
        |SELECT a.vec_id AS a, b.vec_id AS b,
        |       round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.4
        |ORDER BY a, b""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      val n = e.withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      // the quadratic nested-loop STREAMS one side: a sub-split-size table
      // scans as a single input partition, serializing the whole O(n^2) loop
      // onto one core — round-robin to the session's parallelism first (the
      // shuffled rows are n vectors, nothing vs the n^2 pair work; guide
      // §2.5 input skew / §2.6 idle capacity)
      val cos = round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6)
      val a = n.select(col("vec_id").as("a"), col("v").as("va"), col("nrm").as("na"))
        .repartition(s.sparkContext.defaultParallelism)
      val b = n.select(col("vec_id").as("b"), col("v").as("vb"), col("nrm").as("nb"))
      // conjunct order matters: the id comparison SHORT-CIRCUITS the dot
      // product for the a >= b half of the loop (the pushed-down filter
      // otherwise lands first and dots every ordered pair); survivors
      // recompute cos once in the projection — negligible vs the loop
      a.join(b, col("a") < col("b") && cos >= 0.4)
        .select(col("a"), col("b"), cos.as("cos"))
        .orderBy("a", "b")
    },

    // ---- ANN top-k, brute force baseline: top-5 neighbors for the first 20
    // query vectors, ranked by (cos desc, neighbor asc)
    "ann_topk_brute" -> Q(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |q AS (SELECT * FROM n WHERE vec_id < 20),
        |scored AS (
        |  SELECT q.vec_id AS qid, n.vec_id AS nid,
        |         round(list_dot_product(q.v, n.v) / (q.nrm * n.nrm), 6) AS cos
        |  FROM q JOIN n ON q.vec_id <> n.vec_id),
        |ranked AS (SELECT qid, nid, cos,
        |             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk
        |           FROM scored)
        |SELECT qid, rnk, nid, cos FROM ranked WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      val n0 = e.withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      // parallelize the (queries x corpus) loop across the session's cores
      // (a sub-split-size scan is one partition; see dd_embed_cosine); the
      // broadcast query side builds from the UN-shuffled frame
      val n = n0.repartition(s.sparkContext.defaultParallelism)
      val q = broadcast(n0.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn")))
      val scored = q.join(n, col("qid") =!= col("vec_id"))
        .withColumn("cos", round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6))
      val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("qid"), col("rnk"), col("vec_id").as("nid"), col("cos"))
        .orderBy("qid", "rnk")
    },

    // ---- IVF ANN (the other scale path): coarse k-means quantizer, probe
    // the nearest buckets only. Registered with FULL probing (nProbe = k):
    // probing every bucket is exact by construction, so a brute-force DuckDB
    // top-k is a valid oracle — the training iterations only decide bucket
    // routing, never scores. The partial-probe recall path (nProbe=6,
    // recall@5 >= 0.9) is asserted separately in IvfIndexSpec.
    "ann_ivf" -> Q(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id,
        |             list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u
        |      FROM e),
        |q AS (SELECT vec_id AS qid, u AS qu FROM n WHERE vec_id < 20),
        |scored AS (
        |  SELECT q.qid, n.vec_id AS nid, round(list_dot_product(q.qu, n.u), 6) AS cos
        |  FROM q JOIN n ON q.qid <> n.vec_id),
        |ranked AS (SELECT qid, nid, cos,
        |             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        |           FROM scored)
        |SELECT qid, rank, nid, cos FROM ranked WHERE rank <= 5
        |ORDER BY qid, rank""".stripMargin) { (s, d) =>
      val vectors = Tables.embeddings(s, d)
      val model = graft.similarity.IvfIndex.train(s, vectors, k = 16, iters = 2)
      val assigned = graft.similarity.IvfIndex.assign(vectors, model)
      graft.similarity.IvfIndex.topK(assigned,
        vectors.filter(col("vec_id") < 20), model, k = 5, nProbe = 16)
        .orderBy("qid", "rank")
    },

    // ---- LSH-bucketed ANN (the scale path): 8-bit sign bucket over fixed
    // coordinates; pairs only within a bucket — turns the O(n^2) scan into a
    // per-bucket join that shards across the cluster
    "ann_lsh_buckets" -> Q(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |b AS (SELECT vec_id, v,
        |        (CASE WHEN v[1] > 0 THEN 1 ELSE 0 END) + (CASE WHEN v[9] > 0 THEN 2 ELSE 0 END)
        |      + (CASE WHEN v[17] > 0 THEN 4 ELSE 0 END) + (CASE WHEN v[25] > 0 THEN 8 ELSE 0 END)
        |      + (CASE WHEN v[33] > 0 THEN 16 ELSE 0 END) + (CASE WHEN v[41] > 0 THEN 32 ELSE 0 END)
        |      + (CASE WHEN v[49] > 0 THEN 64 ELSE 0 END) + (CASE WHEN v[57] > 0 THEN 128 ELSE 0 END)
        |        AS bucket FROM e),
        |n AS (SELECT vec_id, v, bucket, sqrt(list_dot_product(v, v)) AS nrm FROM b)
        |SELECT x.bucket AS bucket, x.vec_id AS a, y.vec_id AS b,
        |       round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) AS cos
        |FROM n x JOIN n y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
        |WHERE round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) >= 0.3
        |ORDER BY x.bucket, a, b""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      val bucket = (0 until 8).map { i =>
        when(element_at(col("v"), i * 8 + 1) > 0, 1 << i).otherwise(0)
      }.reduce(_ + _)
      val n = e.withColumn("bucket", bucket)
        .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      val x = n.select(col("bucket"), col("vec_id").as("a"), col("v").as("va"), col("nrm").as("na"))
      val y = n.select(col("bucket"), col("vec_id").as("b"), col("v").as("vb"), col("nrm").as("nb"))
      x.join(y, Seq("bucket")).filter(col("a") < col("b"))
        .withColumn("cos", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
        .filter(col("cos") >= 0.3)
        .select("bucket", "a", "b", "cos")
        .orderBy("bucket", "a", "b")
    },

    // ---- int8 scalar-quantized ANN (the memory-bandwidth scale path,
    // FAISS-SQ-style): unit-normalize, clip to [-1, 1], quantize each
    // dimension to floor(u * 127) — an int8 code — and rank neighbors by
    // the INTEGER dot product of code vectors. At 100 TB the ANN scan is
    // bandwidth-bound, so 4x smaller codes mean 4x fewer bytes per probe;
    // this composes with IVF bucketing (quantize within probed buckets).
    // Cross-engine exactness: codes are integer-VALUED doubles, so the
    // codegen'd left-fold dot product is exact integer arithmetic in
    // double (|dot| <= 127^2 * 64 << 2^53) — bit-identical to DuckDB's
    // list_dot_product, no rounding step needed. Quantized recall@5 vs the
    // exact ranking is asserted in ScalarQuantSpec.
    "ann_sq_int8" -> Q(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |qz AS (SELECT vec_id,
        |         list_transform(v, x -> floor(greatest(least(x / nrm, 1.0), -1.0) * 127)) AS q
        |       FROM n),
        |qs AS (SELECT vec_id AS qid, q AS qq FROM qz WHERE vec_id < 20),
        |scored AS (
        |  SELECT qs.qid, z.vec_id AS nid,
        |         CAST(list_dot_product(qs.qq, z.q) AS BIGINT) AS dotq
        |  FROM qs JOIN qz z ON qs.qid <> z.vec_id),
        |ranked AS (SELECT qid, nid, dotq,
        |             row_number() OVER (PARTITION BY qid ORDER BY dotq DESC, nid) AS rnk
        |           FROM scored)
        |SELECT qid, rnk, nid, dotq FROM ranked WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      val n = e.withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      val qz0 = n.select(col("vec_id"),
        transform(col("v"), x =>
          floor(greatest(least(x / col("nrm"), lit(1.0)), lit(-1.0)) * 127)
            .cast("double")).as("q"))
      // parallelize the (queries x codes) loop across the session's cores
      // (a sub-split-size scan is one partition; see dd_embed_cosine); the
      // broadcast query side builds from the UN-shuffled frame
      val qz = qz0.repartition(s.sparkContext.defaultParallelism)
      val qs = broadcast(qz0.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("q").as("qq")))
      val scored = qs.join(qz, col("qid") =!= col("vec_id"))
        .withColumn("dotq", dot(col("qq"), col("q")).cast("long"))
      val w = Window.partitionBy("qid").orderBy(col("dotq").desc, col("vec_id"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("qid"), col("rnk"), col("vec_id").as("nid"), col("dotq"))
        .orderBy("qid", "rnk")
    }
  )
}
