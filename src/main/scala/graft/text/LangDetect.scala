package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Conversation-level language detection, shared by the batch pipeline
  * (KgPipeline.convLanguages) and the streaming ingest (StreamingSync).
  *
  * Detection is argmax function-word hit RATIO over the configured
  * profiles (the reference analogue: per-literal RDF language tags,
  * ESNormalizer's language routing). The primitive is a per-conversation
  * COUNTS row — one hit counter per profile plus a token total — which is
  * ASSOCIATIVE and COMMUTATIVE over turns: counts merged across
  * micro-batches in any arrival order equal the batch pipeline's
  * whole-conversation counts, which is exactly what makes the streaming
  * path bit-identical to batch once the same turns have arrived.
  *
  * Column layout is positional over the SORTED profile keys (hits_0..).
  * State tables persisting these rows must pin [[signature]] so a profile
  * edit cannot silently re-index the counters of an existing lineage. */
object LangDetect {

  def sortedProfiles(m: Map[String, Set[String]]): Seq[(String, Set[String])] =
    m.toSeq.sortBy(_._1)

  /** Pin value for state tables: the counter layout AND the words.
    * Delimiters are escaped so no two distinct profile maps can collide on
    * one signature (e.g. one word "x;b:y" vs two profiles "x" / "y" — a
    * collision would let a profile edit slip past the pin and silently
    * re-index an existing lineage's counters). */
  def signature(m: Map[String, Set[String]]): String = {
    def esc(s: String): String = s.replace("\\", "\\\\")
      .replace(":", "\\c").replace("|", "\\p").replace(";", "\\s")
    sortedProfiles(m).map { case (l, ws) =>
      esc(l) + ":" + ws.toSeq.sorted.map(esc).mkString("|")
    }.mkString(";")
  }

  /** Per-conversation counts: (conv_id, hits_0..hits_{k-1}, n_toks).
    * One narrow aggregation scan; every counter is a map-side-combinable
    * integer sum. */
  def counts(turns: DataFrame, profiles: Seq[(String, Set[String])]): DataFrame = {
    require(profiles.nonEmpty, "language detection requires non-empty langProfiles")
    val toks = TextNorm.tokensCol(col("text"))
    val hitCols = profiles.zipWithIndex.map { case ((_, ws), i) =>
      sum(size(filter(toks, t => t.isInCollection(ws)))).as(s"hits_$i")
    }
    turns.groupBy("conv_id")
      .agg(hitCols.head, (hitCols.tail :+ sum(size(toks)).as("n_toks")): _*)
  }

  /** Associative roll-up of counts rows across batches. */
  def merge(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    a.unionByName(b).groupBy("conv_id")
      .agg(sum(col("hits_0")).as("hits_0"),
        ((1 until k).map(i => sum(col(s"hits_$i")).as(s"hits_$i")) :+
          sum(col("n_toks")).as("n_toks")): _*)

  /** Winner per conversation: argmax hit ratio; ties break toward the
    * lexicographically LATER language (struct max compares (score, lang));
    * `default` when no profile hits at all. Deterministic, so Spark and a
    * SQL oracle (or a re-run) agree bit-for-bit. */
  def pick(countsDf: DataFrame, profiles: Seq[(String, Set[String])],
           default: String): DataFrame = {
    val best = array_max(array(profiles.zipWithIndex.map { case ((l, _), i) =>
      struct(
        (col(s"hits_$i").cast("double") / greatest(col("n_toks"), lit(1)))
          .as("score"),
        lit(l).as("lang"))
    }: _*))
    countsDf.select(col("conv_id"),
      when(best.getField("score") > 0, best.getField("lang"))
        .otherwise(lit(default)).as("lang"))
  }
}
