package graft.link

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.schema.{CatalogEntry, Turn}
import graft.text.TextNorm

/** Contextual entity linking: broadcast-hash-join candidate lookup (J1,
  * getLabelForUri, ESNormalizer.java:410-457) scored with TF-IDF-weighted
  * token overlap + Jaccard, top-1 per mention via a ranked window (W3).
  *
  * This is the scored generalization of the extractor's first-match-wins
  * resolution: when an alias is ambiguous, the candidate whose pref-label
  * context best matches the turn's tokens wins; rank breaks exact ties, so
  * the output is fully deterministic.
  *
  * Plan shape at scale: turns tokenize (narrow) -> explode -> broadcast join
  * against the alias dictionary (no shuffle of the big side) -> per-mention
  * window. The only wide exchange is the window partition by
  * (conv_id, turn_idx, alias), which AQE coalesces.
  */
object EntityLinker {

  /** @return (conv_id, turn_idx, alias, entity_id, score) — one row per
    *         detected mention, linked to its best candidate. Detection here
    *         is TOKEN-level (single-token aliases only); the pipeline's
    *         resolution path uses [[linkMentions]] with the extractor's own
    *         trie-matched spans so multi-token aliases score identically. */
  def link(turns: Dataset[Turn], catalog: Seq[CatalogEntry]): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._

    val cat = catalog.toDF("entity_id", "alias", "pref_label", "rank")

    val turnToks = turns.toDF()
      .select(col("conv_id"), col("turn_idx"),
        TextNorm.tokensCol(TextNorm.parseForJsonCol(col("text"))).as("toks"))
      .select(col("conv_id"), col("turn_idx"), col("toks"),
        explode(col("toks")).as("tok"))

    // mentions: tokens that are catalog aliases (broadcast equality join);
    // turn tokens are lowercased by tokensCol, so aliases are lowered too —
    // linking is case-insensitive by contract
    val aliases = broadcast(cat.select(lower(col("alias")).as("alias"),
      col("entity_id"), col("rank")).distinct())
    val mentions = turnToks
      .join(aliases, col("tok") === col("alias"))
      .select(col("conv_id"), col("turn_idx"), col("toks"),
        col("alias"), col("entity_id"), col("rank"))

    scoreCandidates(mentions, cat, catalog)
  }

  /** Score CALLER-SUPPLIED mention spans — `mentions` is (conv_id:string,
    * turn_idx:int, alias:string) with the alias already whitespace-normalized
    * and lowercased (the extractor's [[graft.extract.Extractor.ambSentinel]]
    * normalization). Unlike [[link]], which re-detects mentions one token at
    * a time, this path trusts the extraction trie's longest-match span, so a
    * multi-token ambiguous alias ("apache spark" naming two entities) gets
    * the same contextual scoring as a single-token one.
    *
    * Plan shape at scale: the turn side is tokenized narrow and joined to
    * mentions on (conv_id, turn_idx) — an equality shuffle join whose
    * mention side is ambiguous-mention-sized (usually far smaller than the
    * corpus; AQE broadcasts it when it fits). Candidate lookup and context
    * scoring stay broadcast, same as [[link]].
    *
    * @return (conv_id, turn_idx, alias, entity_id, score), top-1 per
    *         mention, fully deterministic. */
  def linkMentions(turns: Dataset[Turn], mentions: DataFrame,
                   catalog: Seq[CatalogEntry]): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._

    val cat = catalog.toDF("entity_id", "alias", "pref_label", "rank")
    val turnToks = turns.toDF()
      .select(col("conv_id"), col("turn_idx"),
        TextNorm.tokensCol(TextNorm.parseForJsonCol(col("text"))).as("toks"))
    val aliases = broadcast(cat.select(lower(col("alias")).as("alias"),
      col("entity_id"), col("rank")).distinct())
    val cands = mentions
      .join(turnToks, Seq("conv_id", "turn_idx"))
      .join(aliases, "alias")
      .select(col("conv_id"), col("turn_idx"), col("toks"),
        col("alias"), col("entity_id"), col("rank"))
    scoreCandidates(cands, cat, catalog)
  }

  /** Shared contextual scorer: TF-IDF-weighted context-token overlap,
    * Jaccard-normalized, rank tie-break, top-1 per (conv, turn, alias).
    * `cands` is (conv_id, turn_idx, toks, alias, entity_id, rank). */
  private def scoreCandidates(cands: DataFrame, cat: DataFrame,
                              catalog: Seq[CatalogEntry]): DataFrame = {
    // document frequency of catalog context tokens -> idf weight (driver-side:
    // the catalog is the small dimension; its idf table broadcasts)
    val nEnt = catalog.map(_.entityId).distinct.size.toDouble
    val ctxToks = cat
      .select(col("entity_id"), explode(TextNorm.tokensCol(col("pref_label"))).as("tok"))
      .distinct()
    val idf = ctxToks.groupBy("tok")
      .agg(count(lit(1)).as("dfq"))
      .withColumn("idf", log(lit(nEnt + 1) / (col("dfq") + 1)))

    // score: sum of idf over candidate context tokens present in the turn,
    // normalized Jaccard-style by candidate context size
    val candCtx = broadcast(ctxToks.join(idf, "tok")
      .groupBy("entity_id")
      .agg(collect_list(struct(col("tok"), col("idf"))).as("ctx"),
        count(lit(1)).as("ctx_n")))

    val scored = cands.join(candCtx, "entity_id")
      .withColumn("overlap",
        aggregate(
          filter(col("ctx"), c => array_contains(col("toks"), c.getField("tok"))),
          lit(0.0), (acc, c) => acc + c.getField("idf")))
      .withColumn("score", col("overlap") / (size(col("toks")) + col("ctx_n")))

    val w = Window.partitionBy("conv_id", "turn_idx", "alias")
      .orderBy(col("score").desc, col("rank"), col("entity_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("conv_id", "turn_idx", "alias", "entity_id", "score")
  }
}
