package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextNorm

/** Text-analysis operators for a training-data pipeline: token counting
  * (whitespace + BPE-ish regex), quality scoring, language-ID heuristic, and
  * document fingerprinting — all pure codegen'd Column expressions. */
object TextStatsQueries {

  /** Char-trigram language-ID profiles: synthetic "dialects" over the corpus
    * vocabulary (the fixture a function-word heuristic cannot separate —
    * same script, same tokenizer). A trigram may appear in MULTIPLE profiles
    * ("sca" below, deliberately) and then counts toward each; the tie-break
    * is (hits desc, lang asc), locked by LangIdNgramSpec. */
  val triProfiles: Seq[(String, String)] = Seq(
    "sqlish" -> Seq("tab", "que", "joi", "fil", "sca"),
    "opsish" -> Seq("sor", "mer", "has", "gro", "sca"),
    "datish" -> Seq("dat", "str", "vec", "row", "col"))
    .flatMap { case (l, ts) => ts.map(l -> _) }

  private val triProfilesSql: String =
    triProfiles.map { case (l, t) => s"('$l','$t')" }.mkString(", ")

  /** Char-trigram language-ID over (doc_id, text): per-(doc, lang)
    * OVERLAPPING occurrence counts of the profile trigrams, winner by
    * (hits desc, lang asc), docs with no profile hit -> 'und'. Counts are
    * exact ints so the result is bit-identical cross-engine.
    *
    * Plan shape at scale (round-4 rewrite, ~7x on the sweep): entirely
    * NARROW — per language, the hits column is a sum of native
    * [[graft.functions.CountSubstring]] expressions (one codegen'd
    * indexOf loop per profile trigram, no per-position substring
    * allocation), and the winner is an argmax over a struct array in the
    * same projection. No explode, no join, no aggregation, no window: the
    * only shuffle a caller pays is its own ordering. The previous form
    * (position-transform + membership filter + profile join + window)
    * generated one substring PER CHARACTER of the corpus just to test set
    * membership, then shuffled the hit rows twice. */
  def langIdNgram(docs: org.apache.spark.sql.DataFrame,
                  profiles: Seq[(String, String)]): org.apache.spark.sql.DataFrame = {
    val base = docs.select(col("doc_id"), lower(col("text")).as("t"))
    // (hits, -idx) argmax over lexicographically sorted languages: struct
    // max takes higher hits first, then the HIGHER negated index = the
    // EARLIER language — the (hits desc, lang asc) rule of the oracle.
    // CountSubstring is null-intolerant, so a NULL text yields NULL sums;
    // the coalesce maps that doc to the no-hit ('und', 0) case.
    val langs: Seq[(String, Seq[String])] =
      profiles.groupBy(_._1).view.mapValues(_.map(_._2)).toSeq.sortBy(_._1)
    val hitCols = langs.zipWithIndex.map { case ((_, tris), i) =>
      coalesce(
        tris.map(tri =>
          graft.functions.CountSubstring.count(col("t"), lit(tri)))
          .reduce(_ + _),
        lit(0L)).as(s"hits_$i")
    }
    val counted = base.select(col("doc_id") +: hitCols: _*)
    val best = array_max(array(langs.indices.map(i =>
      struct(col(s"hits_$i").as("hits"), lit(-i).as("negidx"))): _*))
    val langName = element_at(
      typedlit(langs.map(_._1)), (best.getField("negidx") * -1) + 1)
    counted.select(col("doc_id"),
      when(best.getField("hits") > 0, langName).otherwise(lit("und")).as("lang"),
      best.getField("hits").as("hits"))
  }

  val all: Map[String, Q] = Map(

    // ---- char-n-gram language-ID (round-4: the function-word heuristic in
    // ta_langid cannot separate same-script languages; trigram profiles
    // can). Profiles are the synthetic fixture above; 'und' for no signal.
    "ta_langid_ngram" -> Q(
      s"""WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
         |tris AS (SELECT doc_id, substring(t, i, 3) AS tri
         |         FROM (SELECT doc_id, t,
         |                      unnest(range(1, greatest(length(t) - 2, 0) + 1)) AS i
         |               FROM d)),
         |prof(lang, tri) AS (VALUES $triProfilesSql),
         |hits AS (SELECT t.doc_id, p.lang, count(*) AS hits
         |         FROM tris t JOIN prof p ON t.tri = p.tri GROUP BY 1, 2),
         |best AS (SELECT doc_id, lang, hits,
         |                row_number() OVER (PARTITION BY doc_id
         |                  ORDER BY hits DESC, lang) AS rn
         |         FROM hits)
         |SELECT d.doc_id AS doc_id, coalesce(b.lang, 'und') AS lang,
         |       CAST(coalesce(b.hits, 0) AS BIGINT) AS hits
         |FROM d LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      langIdNgram(Tables.documents(s, d), triProfiles).orderBy("doc_id")
    },

    // ---- keyword extraction: top-3 terms per doc by tf/df weight (the
    // TF-IDF family with an exactly-comparable weight: tf and df are exact
    // ints, the ratio is ONE double division — bit-identical cross-engine,
    // the kg_link_jaccard precedent; ln-based idf would not be). Plan
    // shape: the tokenize+tf aggregate feeds BOTH join sides (df is a
    // term-sized re-aggregate of it; exchange reuse dedupes the shared
    // shuffle at runtime), per-doc top-k is a window — all map-side
    // combinable.
    "ta_keyword_tfidf" -> Q(
      """WITH toks AS (
        |  SELECT doc_id, tok, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(list_filter(
        |          string_split_regex(lower(text), '\s+'), x -> length(x) > 0)) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |df AS (SELECT tok, count(*) AS df FROM toks GROUP BY tok),
        |scored AS (
        |  SELECT t.doc_id, t.tok, t.tf, d.df,
        |         CAST(t.tf AS DOUBLE) / d.df AS w,
        |         row_number() OVER (PARTITION BY t.doc_id
        |           ORDER BY CAST(t.tf AS DOUBLE) / d.df DESC, t.tok) AS rn
        |  FROM toks t JOIN df d ON t.tok = d.tok)
        |SELECT doc_id, tok, tf, df, w FROM scored WHERE rn <= 3
        |ORDER BY doc_id, w DESC, tok""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextNorm.tokensCol(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      // document frequency attaches as a count WINDOW over tok — one
      // exchange, no groupBy+join pair (guide §2.4; same idiom as the CC
      // round body). toks rows are unique per (doc, tok), so the window
      // count equals the former df aggregate.
      val w = Window.partitionBy("doc_id")
        .orderBy((col("tf").cast("double") / col("df")).desc, col("tok"))
      toks
        .withColumn("df", count(lit(1)).over(Window.partitionBy("tok")))
        .withColumn("w", col("tf").cast("double") / col("df"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("doc_id", "tok", "tf", "df", "w")
        .orderBy(col("doc_id"), col("w").desc, col("tok"))
    },

    // ---- deterministic stratified sampling for curation: per-language
    // sample rates via an md5 hash bucket compared AS A HEX STRING (both
    // engines agree on md5 and on lexicographic compare; integer hash
    // functions differ between Spark and DuckDB). Reproducible across runs
    // and engines, no RNG, narrow scan + broadcast rate map — embarrassingly
    // parallel at any scale.
    "ta_stratified_sample" -> Q(
      """WITH rates(lang, thr) AS (VALUES
        |  ('en', '80'), ('es', '40'), ('de', '40'), ('fr', '40'), ('zh', '1a')),
        |h AS (SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS b
        |      FROM documents)
        |SELECT h.doc_id, h.lang, h.b
        |FROM h JOIN rates r ON h.lang = r.lang
        |WHERE h.b < r.thr
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val rates = broadcast(Seq(("en", "80"), ("es", "40"), ("de", "40"),
        ("fr", "40"), ("zh", "1a")).toDF("rlang", "thr"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2).as("b"))
        .join(rates, col("lang") === col("rlang"))
        .filter(col("b") < col("thr"))
        .select("doc_id", "lang", "b")
        .orderBy("doc_id")
    },

    // ---- token counting: whitespace tokens + BPE-ish regex pieces
    "ta_token_counts" -> Q(
      """SELECT doc_id,
        |       len(list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0)) AS n_ws,
        |       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe,
        |       length(text) AS n_chars_calc
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(TextNorm.tokensCol(col("text"))).as("n_ws"),
          regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).as("n_bpe"),
          length(col("text")).as("n_chars_calc"))
        .orderBy("doc_id")
    },

    // ---- quality scoring: length / stopword ratio / mean token length —
    // exact-int numerators and denominators, single double division
    "ta_quality_score" -> Q(
      """WITH t AS (
        |  SELECT doc_id, length(text) AS n_chars_calc,
        |         len(list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0)) AS n_words,
        |         len(list_filter(string_split_regex(lower(text), '\s+'), x -> x IN ('the', 'a'))) AS n_stop,
        |         length(replace(text, ' ', '')) AS n_alpha
        |  FROM documents)
        |SELECT doc_id, n_chars_calc, n_words,
        |       CAST(n_stop AS DOUBLE) / n_words AS stop_ratio,
        |       CAST(n_alpha AS DOUBLE) / n_words AS avg_word_len
        |FROM t WHERE n_words > 0 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = TextNorm.tokensCol(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          length(col("text")).as("n_chars_calc"),
          size(toks).as("n_words"),
          size(filter(toks, t => t.isin("the", "a"))).as("n_stop"),
          length(regexp_replace(col("text"), " ", "")).as("n_alpha"))
        .filter(col("n_words") > 0)
        .select(col("doc_id"), col("n_chars_calc"), col("n_words"),
          col("n_stop").cast("double") / col("n_words") as "stop_ratio",
          col("n_alpha").cast("double") / col("n_words") as "avg_word_len")
        .orderBy("doc_id")
    },

    // ---- language-ID heuristic: function-word ratio n-gram-style signal;
    // agreement flag against the labeled lang column
    "ta_langid" -> Q(
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         len(list_filter(string_split_regex(lower(text), '\s+'), x -> x IN ('the', 'a'))) AS n_stop,
        |         len(list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0)) AS n_words
        |  FROM documents)
        |SELECT doc_id, lang,
        |       CASE WHEN n_words > 0 AND CAST(n_stop AS DOUBLE) / n_words > 0.05
        |            THEN 'en' ELSE 'unk' END AS predicted
        |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = TextNorm.tokensCol(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(filter(toks, t => t.isin("the", "a"))).as("n_stop"),
          size(toks).as("n_words"))
        .select(col("doc_id"), col("lang"),
          when(col("n_words") > 0 &&
            col("n_stop").cast("double") / col("n_words") > 0.05, "en")
            .otherwise("unk").as("predicted"))
        .orderBy("doc_id")
    },

    // ---- repetition signals (Gopher/C4-style quality filters): duplicate
    // word-bigram fraction and top-token dominance, per document. Computed
    // entirely with higher-order array functions over the token list — a
    // NARROW per-row stage, no shuffle at any corpus size (the alternative
    // explode+groupBy formulation costs two exchanges; per-row cost here is
    // O(n·distinct), the right trade for chunk-bounded training documents).
    // Exact-int numerators/denominators, single double ops — bit-exact.
    "ta_repetition_ratio" -> Q(
      """WITH toksl AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0) AS l
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, len(l) AS n_words,
        |         CASE WHEN len(l) >= 2
        |              THEN list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])
        |              ELSE [] END AS bgs,
        |         list_max(list_transform(list_distinct(l), t -> len(list_filter(l, x -> x = t)))) AS top_c
        |  FROM toksl)
        |SELECT doc_id, n_words, len(bgs) AS n_bigrams,
        |       CASE WHEN len(bgs) > 0
        |            THEN 1.0 - CAST(len(list_distinct(bgs)) AS DOUBLE) / len(bgs) ELSE 0.0 END AS dup_bigram_frac,
        |       CAST(top_c AS DOUBLE) / n_words AS top_tok_frac
        |FROM st WHERE n_words > 0 ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextNorm.tokensCol(col("text")).as("l"))
        .withColumn("bgs", TextNorm.bigramsCol(col("l")))
        .withColumn("top_c", expr(
          "array_max(transform(array_distinct(l), t -> size(filter(l, x -> x = t))))"))
        .select(col("doc_id"), size(col("l")).as("n_words"),
          size(col("bgs")).as("n_bigrams"),
          when(size(col("bgs")) > 0,
            lit(1.0) - size(array_distinct(col("bgs"))).cast("double") / size(col("bgs")))
            .otherwise(lit(0.0)).as("dup_bigram_frac"),
          (col("top_c").cast("double") / size(col("l"))).as("top_tok_frac"))
        .filter(col("n_words") > 0)
        .orderBy("doc_id")
    },

    // ---- document fingerprint: content-defined key = md5 over the sorted
    // distinct token set (word-order-insensitive near-dup key)
    "ta_fingerprint" -> Q(
      """SELECT doc_id,
        |       md5(coalesce(array_to_string(list_sort(list_distinct(
        |         list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0))), ' '), '')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextNorm.fingerprintCol(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    // ---- end-to-end curation: the composition a training-data pipeline
    // actually runs — language gate + quality gates + exact-dedup keeper +
    // order-insensitive near-dup keeper, producing the kept training set.
    // Every signal reuses the operators above, so this locks their
    // composition (filters before the expensive dedup aggregations would be
    // pushed by Catalyst; the group-by keepers are map-side-combinable).
    "ta_curation_pipeline" -> Q(
      """WITH s AS (
        |  SELECT doc_id, text,
        |         len(list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0)) AS n_words,
        |         len(list_filter(string_split_regex(lower(text), '\s+'), x -> x IN ('the', 'a'))) AS n_stop,
        |         length(replace(text, ' ', '')) AS n_alpha,
        |         md5(text) AS h,
        |         md5(coalesce(array_to_string(list_sort(list_distinct(
        |           list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0))), ' '), '')) AS fp
        |  FROM documents),
        |gated AS (
        |  SELECT * FROM s
        |  WHERE n_words >= 5
        |    AND CAST(n_stop AS DOUBLE) / n_words > 0.05
        |    AND CAST(n_alpha AS DOUBLE) / n_words <= 12),
        |keepers AS (
        |  SELECT doc_id, n_words,
        |         row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rh,
        |         row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rf
        |  FROM gated)
        |SELECT doc_id, n_words FROM keepers
        |WHERE rh = 1 AND rf = 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val toks = TextNorm.tokensCol(col("text"))
      val stats = Tables.documents(s, d).select(
        col("doc_id"),
        size(toks).as("n_words"),
        size(filter(toks, t => t.isin("the", "a"))).as("n_stop"),
        length(regexp_replace(col("text"), " ", "")).as("n_alpha"),
        md5(col("text").cast("binary")).as("h"),
        TextNorm.fingerprintCol(col("text")).as("fp"))
      val gated = stats.filter(
        col("n_words") >= 5 &&
          col("n_stop").cast("double") / col("n_words") > 0.05 &&
          col("n_alpha").cast("double") / col("n_words") <= 12)
      gated
        .withColumn("rh", row_number().over(
          Window.partitionBy("h").orderBy("doc_id")))
        .withColumn("rf", row_number().over(
          Window.partitionBy("fp").orderBy("doc_id")))
        .filter(col("rh") === 1 && col("rf") === 1)
        .select("doc_id", "n_words")
        .orderBy("doc_id")
    },

    // ---- multimodal plumbing: opaque binary payload column + typed
    // metadata (byte length, magic prefix); the decode/feature kernel is the
    // deterministic stub in graft.multimodal (no image/audio libs in-box)
    "mm_binary_meta" -> Q(
      """SELECT doc_id, octet_length(unhex(md5(text))) AS n_bytes,
        |       upper(substr(md5(text), 1, 8)) AS magic
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          length(unhex(md5(col("text").cast("binary")))).as("n_bytes"),
          upper(substring(md5(col("text").cast("binary")), 1, 8)).as("magic"))
        .orderBy("doc_id")
    },

    // ---- boilerplate / common-phrase density (the C4/CCNet repeated-
    // passage signal): an n-gram is "boilerplate" within a source when it
    // appears in >= 5 distinct docs of that source; each doc reports the
    // fraction of its n-gram positions covered by boilerplate grams. n = 2
    // here to match the synthetic corpus' phrase statistics — production
    // corpora use n ~ 13 (Gopher); the plan is n-independent. Shape at
    // scale: position explode is narrow, the doc-frequency aggregation and
    // the membership join both key on (source, gram) — map-side combinable,
    // never quadratic. Counts exact ints, frac one int division.
    "ta_boilerplate_ngrams" -> Q(
      """WITH toks AS (
        |  SELECT doc_id, source,
        |         list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0) AS l
        |  FROM documents),
        |g AS (SELECT doc_id, source, l[i] || ' ' || l[i+1] AS g
        |      FROM (SELECT doc_id, source, l, unnest(range(1, len(l))) AS i
        |            FROM toks WHERE len(l) >= 2)),
        |freq AS (SELECT source, g FROM g GROUP BY source, g
        |         HAVING count(DISTINCT doc_id) >= 5),
        |cov AS (SELECT g.doc_id,
        |               CAST(count(*) AS BIGINT) AS n_pos,
        |               CAST(count(*) FILTER (WHERE f.g IS NOT NULL) AS BIGINT) AS covered
        |        FROM g LEFT JOIN freq f ON g.source = f.source AND g.g = f.g
        |        GROUP BY g.doc_id)
        |SELECT doc_id, n_pos, covered,
        |       CAST(covered AS DOUBLE) / n_pos AS frac
        |FROM cov ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), TextNorm.tokensCol(col("text")).as("l"))
        .filter(size(col("l")) >= 2)
      val g = toks.select(col("doc_id"), col("source"),
        explode(TextNorm.bigramsCol(col("l"))).as("g"))
      val freq = g.groupBy("source", "g")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 5)
        .select(col("source"), col("g"), lit(1).as("hit"))
      g.join(freq, Seq("source", "g"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_pos"),
          count(col("hit")).as("covered"))
        .select(col("doc_id"), col("n_pos"), col("covered"),
          (col("covered").cast("double") / col("n_pos")).as("frac"))
        .orderBy("doc_id")
    },

    // ---- corpus composition by source domain (the sampling-weight input
    // for training-mix decisions): per source, doc and exact token counts
    // plus near-dup pressure (docs sharing an order-insensitive fingerprint
    // — the same key the dedup family uses, so "dup" means the same thing
    // everywhere). One aggregation over a pruned 3-column scan.
    "ta_domain_mix" -> Q(
      """WITH f AS (
        |  SELECT doc_id, source,
        |         len(list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0)) AS n_toks,
        |         md5(coalesce(array_to_string(list_sort(list_distinct(
        |           list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0))), ' '), '')) AS fp
        |  FROM documents)
        |SELECT source,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
        |       CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct,
        |       CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_dups
        |FROM f GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("source"),
          size(TextNorm.tokensCol(col("text"))).as("n_toks"),
          TextNorm.fingerprintCol(col("text")).as("fp"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).cast("long").as("n_tokens"),
          countDistinct(col("fp")).as("n_distinct"),
          (count(lit(1)) - countDistinct(col("fp"))).as("n_dups"))
        .orderBy("source")
    }
  )
}
