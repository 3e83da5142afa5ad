package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextNorm

/** Training-data curation operators over documents and the derived
  * transcript view: PII redaction, benchmark decontamination, SFT
  * prompt/response pair extraction, tool-transition mining, greedy sequence
  * packing, and overlapping passage chunking.
  *
  * These extend the reference's normalize-for-indexing surface
  * (ESNormalizer.java's parseForJson / filter chain) to the operations a
  * 100 TB LLM-training pipeline needs before tokenization. Every operator is
  * a narrow per-row transform plus at most one key-partitioned shuffle —
  * nothing here is quadratic in corpus size or collects to the driver.
  */
object CurationQueries {

  // ---- PII patterns: the common RE2/Java-regex subset so Spark and the
  // DuckDB oracle match byte-for-byte. No \d or \b: spelled-out classes
  // behave identically in both engines.
  private[graft] val emailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private[graft] val ipPat = "[0-9]{1,3}(\\.[0-9]{1,3}){3}"
  private[graft] val phonePat = "\\+[0-9][0-9 ]*[0-9]"

  /** Benchmark word-trigrams for decontamination (four that occur in the
    * synthetic corpus vocabulary, one that cannot). */
  private[graft] val benchTrigrams = Seq(
    "key agg row", "scan slow fast", "batch window spark",
    "data query small", "zebra qux corge")

  private val benchTrigramsSql: String =
    benchTrigrams.map(t => s"('$t')").mkString(", ")

  val all: Map[String, Q] = Map(

    // ---- PII redaction: deterministic PII is appended to the corpus text
    // (the same derivation in both engines — the synthetic vocabulary has
    // none), then emails / IPv4s / phone numbers are counted and replaced.
    // Plan shape: pure per-row codegen'd regex work, zero shuffles at any
    // corpus size; output carries counts + the md5 of the redacted text so
    // the value compare is exact without shipping full texts.
    "ta_pii_redact" -> Q(
      s"""WITH p AS (
         |  SELECT doc_id,
         |         coalesce(text, '') ||
         |         CASE doc_id % 5
         |           WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
         |           WHEN 1 THEN ' from host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || ' port 443'
         |           WHEN 2 THEN ' call +1 555 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |           ELSE ''
         |         END AS t
         |  FROM documents)
         |SELECT doc_id,
         |       CAST(len(regexp_extract_all(t, '$emailPat')) AS BIGINT) AS n_email,
         |       CAST(len(regexp_extract_all(t, '$ipPat')) AS BIGINT) AS n_ip,
         |       CAST(len(regexp_extract_all(t, '$phonePat')) AS BIGINT) AS n_phone,
         |       md5(regexp_replace(regexp_replace(regexp_replace(t,
         |         '$emailPat', '<EMAIL>', 'g'),
         |         '$ipPat', '<IP>', 'g'),
         |         '$phonePat', '<PHONE>', 'g')) AS red_md5
         |FROM p ORDER BY doc_id""".stripMargin) { (s, d) =>
      val t = concat(
        coalesce(col("text"), lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com now")))
          .when(col("doc_id") % 5 === 1,
            concat(lit(" from host 10.0."), (col("doc_id") % 256).cast("string"),
              lit("."), ((col("doc_id") * 7) % 256).cast("string"), lit(" port 443")))
          .when(col("doc_id") % 5 === 2,
            concat(lit(" call +1 555 "),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")))
      Tables.documents(s, d)
        .select(col("doc_id"), t.as("t"))
        .select(
          col("doc_id"),
          regexp_count(col("t"), lit(emailPat)).cast("bigint").as("n_email"),
          regexp_count(col("t"), lit(ipPat)).cast("bigint").as("n_ip"),
          regexp_count(col("t"), lit(phonePat)).cast("bigint").as("n_phone"),
          md5(regexp_replace(regexp_replace(regexp_replace(col("t"),
            lit(emailPat), lit("<EMAIL>")),
            lit(ipPat), lit("<IP>")),
            lit(phonePat), lit("<PHONE>"))).as("red_md5"))
        .orderBy("doc_id")
    },

    // ---- decontamination: flag documents sharing any benchmark word
    // trigram. The trigram stream is generated narrow and filtered to the
    // broadcast benchmark set INSIDE the per-row transform (langIdNgram
    // precedent), so the downstream distinct-count aggregation sees only
    // hit rows — at 100 TB the exploded volume is O(hits), not O(tokens).
    "ta_decontaminate" -> Q(
      s"""WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'), x -> length(x) > 0) AS l FROM documents),
         |tg AS (SELECT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS tg
         |       FROM (SELECT doc_id, l, unnest(range(1, len(l) - 1)) AS i FROM d)),
         |bench(tg) AS (VALUES $benchTrigramsSql),
         |hits AS (SELECT t.doc_id, count(DISTINCT t.tg) AS n_hits
         |         FROM tg t JOIN bench b ON t.tg = b.tg GROUP BY 1)
         |SELECT d.doc_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
         |       coalesce(h.n_hits, 0) = 0 AS keep
         |FROM d LEFT JOIN hits h ON d.doc_id = h.doc_id
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val benchSet = typedlit(benchTrigrams)
      val toksl = Tables.documents(s, d).select(
        col("doc_id"),
        TextNorm.tokensCol(coalesce(col("text"), lit(""))).as("l"))
      val tris = toksl
        .select(col("doc_id"), explode(
          when(size(col("l")) >= 3,
            filter(
              transform(sequence(lit(1), size(col("l")) - 2),
                i => concat_ws(" ", element_at(col("l"), i),
                  element_at(col("l"), i + 1), element_at(col("l"), i + 2))),
              x => array_contains(benchSet, x)))
            .otherwise(expr("cast(array() as array<string>)"))).as("tg"))
      val hits = tris.groupBy("doc_id")
        .agg(countDistinct(col("tg")).as("n_hits"))
      toksl.select("doc_id").join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)) === 0).as("keep"))
        .orderBy("doc_id")
    },

    // ---- SFT pair extraction: each assistant turn paired with the most
    // recent preceding user turn of its conversation (tool turns skipped).
    // One window + one (conv_id, turn_idx)-keyed join — both partitioned on
    // conv_id, so the shuffle co-locates and reuses.
    "ta_sft_pairs" -> Q(
      s"""WITH t AS (${KgQueries.turnsSql}),
         |lens AS (SELECT conv_id, turn_idx, role, length(coalesce(text, '')) AS len FROM t),
         |w AS (SELECT conv_id, turn_idx, role, len,
         |             max(CASE WHEN role = 'user' THEN turn_idx END) OVER
         |               (PARTITION BY conv_id ORDER BY turn_idx
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prompt_idx
         |      FROM lens),
         |pairs AS (SELECT conv_id, turn_idx AS response_idx, len AS response_len, prompt_idx
         |          FROM w WHERE role = 'assistant' AND prompt_idx IS NOT NULL)
         |SELECT p.conv_id, p.response_idx, p.prompt_idx,
         |       u.len AS prompt_len, p.response_len
         |FROM pairs p JOIN lens u
         |  ON u.conv_id = p.conv_id AND u.turn_idx = p.prompt_idx
         |ORDER BY p.conv_id, p.response_idx""".stripMargin) { (s, d) =>
      val t = KgQueries.turns(s, d).select(
        col("conv_id"), col("turn_idx"), col("role"),
        length(coalesce(col("text"), lit(""))).cast("bigint").as("len"))
      val w = Window.partitionBy("conv_id").orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
      val pairs = t
        .withColumn("prompt_idx",
          max(when(col("role") === "user", col("turn_idx"))).over(w))
        .filter(col("role") === "assistant" && col("prompt_idx").isNotNull)
        .select(col("conv_id"), col("turn_idx").as("response_idx"),
          col("len").as("response_len"), col("prompt_idx"))
      val prompts = t.filter(col("role") === "user")
        .select(col("conv_id"), col("turn_idx").as("prompt_idx"),
          col("len").as("prompt_len"))
      pairs.join(prompts, Seq("conv_id", "prompt_idx"))
        .select("conv_id", "response_idx", "prompt_idx", "prompt_len",
          "response_len")
        .orderBy("conv_id", "response_idx")
    },

    // ---- tool-transition mining over agent transcripts: consecutive tool
    // invocations within a conversation -> (src, dst) Markov transition
    // counts. The tool id is derived deterministically from the transcript
    // view (role/tool derivation precedent). Filter first, then a per-conv
    // window over the tool turns only, then a map-side-combinable count.
    "ta_tool_transitions" -> Q(
      s"""WITH t AS (${KgQueries.turnsSql}),
         |tt AS (SELECT conv_id, turn_idx,
         |              'tool' || CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) % 4 AS VARCHAR) AS tool
         |       FROM t WHERE role = 'tool'),
         |tr AS (SELECT conv_id, tool AS src_tool,
         |              lead(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS dst_tool
         |       FROM tt)
         |SELECT src_tool, dst_tool, count(*) AS n
         |FROM tr WHERE dst_tool IS NOT NULL
         |GROUP BY 1, 2 ORDER BY src_tool, dst_tool""".stripMargin) { (s, d) =>
      val tt = KgQueries.turns(s, d)
        .filter(col("role") === "tool")
        .select(col("conv_id"), col("turn_idx"),
          concat(lit("tool"),
            (ascii(substring(md5(col("doc_id").cast("string")), 1, 1)) % 4)
              .cast("string")).as("tool"))
      val w = Window.partitionBy("conv_id").orderBy("turn_idx")
      tt.withColumn("dst_tool", lead(col("tool"), 1).over(w))
        .filter(col("dst_tool").isNotNull)
        .groupBy(col("tool").as("src_tool"), col("dst_tool"))
        .agg(count(lit(1)).as("n"))
        .orderBy("src_tool", "dst_tool")
    },

    // ---- greedy sequence packing: contiguous turns of a conversation are
    // packed into token-budget chunks (chunk = exclusive-prefix-sum div
    // budget — the streaming pack that lets a boundary turn overflow its
    // chunk rather than splitting it). One window + one groupBy, both keyed
    // on conv_id: a single co-located shuffle at any corpus size.
    "ta_seq_pack" -> Q(
      s"""WITH t AS (${KgQueries.turnsSql}),
         |toks AS (SELECT conv_id, turn_idx,
         |                CAST(len(list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'), x -> length(x) > 0)) AS BIGINT) AS ntok
         |         FROM t),
         |c AS (SELECT conv_id, turn_idx, ntok,
         |             CAST(coalesce(sum(ntok) OVER (PARTITION BY conv_id ORDER BY turn_idx
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         |      FROM toks)
         |SELECT conv_id, cum_before // 120 AS chunk_id,
         |       count(*) AS n_turns, CAST(sum(ntok) AS BIGINT) AS tok_total
         |FROM c GROUP BY 1, 2 ORDER BY conv_id, chunk_id""".stripMargin) { (s, d) =>
      val toks = KgQueries.turns(s, d).select(
        col("conv_id"), col("turn_idx"),
        size(TextNorm.tokensCol(coalesce(col("text"), lit(""))))
          .cast("bigint").as("ntok"))
      val w = Window.partitionBy("conv_id").orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
      toks
        .withColumn("cum_before", coalesce(sum(col("ntok")).over(w), lit(0L)))
        .groupBy(col("conv_id"), expr("cum_before div 120").as("chunk_id"))
        .agg(count(lit(1)).as("n_turns"), sum(col("ntok")).as("tok_total"))
        .orderBy("conv_id", "chunk_id")
    },

    // ---- overlapping passage chunking (RAG/window pretraining prep):
    // window of 12 tokens, stride 8. Chunk enumeration is a narrow per-row
    // sequence explode — no shuffle anywhere; output is bounded by
    // tokens/stride, never quadratic.
    "ta_chunk_overlap" -> Q(
      """WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'), x -> length(x) > 0) AS l FROM documents),
        |n AS (SELECT doc_id, l, CAST(len(l) AS BIGINT) AS n FROM d),
        |ch AS (SELECT doc_id, l, n,
        |              unnest(range(0, CASE WHEN n = 0 THEN 0
        |                                   ELSE 1 + (greatest(n - 12, 0) + 7) // 8 END)) AS i
        |       FROM n)
        |SELECT doc_id, i AS chunk_idx, i * 8 + 1 AS start_pos,
        |       least(12, n - i * 8) AS n_toks,
        |       l[CAST(i * 8 + 1 AS INT)] AS head_tok
        |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
      val dl = Tables.documents(s, d)
        .select(col("doc_id"),
          TextNorm.tokensCol(coalesce(col("text"), lit(""))).as("l"))
        .withColumn("n", size(col("l")).cast("bigint"))
        .withColumn("nch",
          when(col("n") === 0, lit(0L))
            .otherwise(lit(1L) + expr("(greatest(n - 12, 0L) + 7) div 8")))
      dl.select(col("doc_id"), col("l"), col("n"),
          explode(when(col("nch") > 0, sequence(lit(0L), col("nch") - 1))
            .otherwise(expr("cast(array() as array<bigint>)"))).as("i"))
        .select(col("doc_id"), col("i").as("chunk_idx"),
          (col("i") * 8 + 1).as("start_pos"),
          least(lit(12L), col("n") - col("i") * 8).as("n_toks"),
          element_at(col("l"), (col("i") * 8 + 1).cast("int")).as("head_tok"))
        .orderBy("doc_id", "chunk_idx")
    })
}
