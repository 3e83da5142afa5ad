package graft.materialize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.config.PipelineConfig

/** Per-subject per-language document assembly — the reference's actual
  * output shape (one ES JSON doc per (resource, language),
  * Harvester.java:1826-1877 + ESNormalizer.process):
  *
  *  - A2: values of a predicate collect into a deduplicated list
  *    (collect_set). Reference preserves first-seen order; we standardize on
  *    array_sort for determinism under parallelism (documented divergence,
  *    SURVEY.md §7.4.6).
  *  - P3: empty value lists are never emitted (ESNormalizer.java:226).
  *  - A6: untagged ("") values are shared properties — merged into every
  *    tagged language doc of the subject (value lists unioned per key); a
  *    subject with only untagged values keeps one doc stamped with the
  *    configured default language (ESNormalizer.java:114-127, 177-194).
  *  - `addLanguage`: every language-TAGGED doc carries a `language: [lang]`
  *    property (ESNormalizer.java:193-194 `jsonMaps.get(lang).put("language",
  *    lang)` — applied only when `!lang.equals("")`, so untagged-only docs
  *    never get one). put() overwrite semantics: an extracted `language`
  *    predicate is replaced, not merged.
  *  - `includeResourceURI`: an `about: [<subject URI>]` property is added to
  *    the SHARED doc (ESNormalizer.addUriForResource, ESNormalizer.java:
  *    318-328 puts into jsonMaps.get("")), so it flows into every tagged doc
  *    via the shared merge, or stays on the untagged-only doc.
  *  - `uriDescription`: object URIs are replaced by the first label found
  *    among the configured label predicates, looked up IN the triple set
  *    itself (getLabelForUri semantics, ESNormalizer.java:410-457; priority
  *    order EEASettings.java:46-50; the live v2 path is the sync-query label
  *    pushdown, Harvester.java:982-1031). Substitution happens BEFORE value
  *    dedup, exactly like the reference's per-value rewrite.
  *  - A5 `normMissing`: per-predicate default values fill the untagged map
  *    when (and only when) it lacks the predicate (ESNormalizer.java:127-155;
  *    see the inline note for the bug-compatible tagged-only case).
  *  - F7: doc id = subj@lang (Harvester.java:1852-1853) — the MERGE key.
  *  - A7: optional items_count_<pred> entries (dead code in the reference,
  *    call site commented out at Harvester.java:1845-1848 — implemented
  *    behind `addCounting`, default off, matching observable behavior).
  *
  * Everything is hash aggregation + per-subject joins (label dictionary and
  * shared-doc joins are dimension-sized; AQE broadcasts them) — no per-doc
  * driver work, scales with the subject count.
  */
object DocAssembler {

  /** J1/J5 label resolution over the model itself: for every object value
    * that matches the URI of a label-described subject, substitute the label;
    * priority = position in `cfg.uriDescription`, ties broken by min label
    * (the reference's inner `LIMIT 1` is endpoint-order-arbitrary; min is the
    * deterministic choice, documented divergence). Non-URI objects simply
    * never match the equality join — the reference's isResource gate for
    * free. */
  def resolveUriLabels(triples: DataFrame, cfg: PipelineConfig): DataFrame =
    resolveUriLabels(triples, cfg, triples)

  /** Variant with an explicit label source: when assembling only a SLICE of
    * the model (incremental doc rebuild), labels must still be looked up in
    * the WHOLE model — an object's label lives under another subject. */
  def resolveUriLabels(triples: DataFrame, cfg: PipelineConfig,
                       labelSource: DataFrame): DataFrame = {
    if (cfg.uriDescription.isEmpty) return triples
    val spark = triples.sparkSession
    import spark.implicits._
    val prio = cfg.uriDescription.zipWithIndex.toDF("pred", "prank")
    val labels = labelSource
      .join(broadcast(prio), "pred")
      .filter(length(col("obj")) > 0) // empty labels never win (getLabelForUri)
      .groupBy(col("subj").as("obj"))
      .agg(min(struct(col("prank"), col("obj").as("l"))).as("best"))
      .select(col("obj"), col("best.l").as("resolved_label"))
    triples
      .join(labels, Seq("obj"), "left")
      .withColumn("obj", coalesce(col("resolved_label"), col("obj")))
      .drop("resolved_label")
      .select(triples.columns.map(col): _*)
  }

  /** F8 + F10 composed: JSON rendering of a literal value with the
    * reference's typed passthrough — numeric/boolean datatypes emit native
    * JSON tokens, everything else a quoted, escaped string
    * (getStringForResult, ESNormalizer.java:349-393: Boolean/Number literal
    * values are added unconverted and serialize as JSON numbers/booleans;
    * mapToString quoting, Harvester.java:1937-1951). */
  def typedJsonValue(obj: org.apache.spark.sql.Column,
                     objType: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val xsd = "http://www.w3.org/2001/XMLSchema#"
    val numeric = Seq("byte", "short", "int", "integer", "long", "float",
      "double", "decimal").map(xsd + _)
    // native passthrough only for lexical forms that ARE valid JSON tokens;
    // anything else (e.g. "NaN"^^xsd:double, "abc"^^xsd:integer) falls back
    // to the quoted-string rendering — emitting it bare would produce
    // invalid JSON
    // RFC 8259 number grammar exactly — note xsd permits leading zeros
    // ("0123" is a valid xsd:integer lexical) but JSON does not, so those
    // fall back to the quoted branch too
    val numericLexical = "^-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?$"
    // RFC 8259 string: escape backslash/quote/\n\r\t, strip remaining
    // control chars (documented: the reference's raw put() would emit them
    // and rely on the ES client's serializer)
    val e1 = regexp_replace(obj, "\\\\", "\\\\\\\\")
    val e2 = regexp_replace(e1, "\"", "\\\\\"")
    val e3 = regexp_replace(e2, "\n", "\\\\n")
    val e4 = regexp_replace(e3, "\r", "\\\\r")
    val e5 = regexp_replace(e4, "\t", "\\\\t")
    val e6 = regexp_replace(e5, "[\\x00-\\x1f]", "")
    when(objType.isInCollection(numeric) && obj.rlike(numericLexical), obj)
      .when(objType === s"${xsd}boolean" && obj.isin("true", "false"), obj)
      .otherwise(concat(lit("\""), e6, lit("\"")))
  }

  /** @param triples columns (subj, pred, obj, lang); lang "" = untagged.
    * @param labelSource label-lookup scope for uriDescription substitution
    *        (defaults to `triples`; pass the full model when `triples` is an
    *        incremental slice).
    * @return (id, subj, lang, doc: Map[String, Array[String]]) */
  def assemble(triples: DataFrame, cfg: PipelineConfig,
               addCounting: Boolean = false,
               labelSource: Option[DataFrame] = None): DataFrame = {
    val resolved = resolveUriLabels(triples, cfg, labelSource.getOrElse(triples))

    val vals = resolved
      .groupBy("subj", "lang", "pred")
      .agg(array_sort(collect_set(col("obj"))).as("vals"))
      .filter(size(col("vals")) > 0) // P3

    val perLang = vals
      .groupBy("subj", "lang")
      .agg(map_from_entries(collect_list(struct(col("pred"), col("vals")))).as("doc"))

    // A6 merge kernel: union value lists per key, sorted
    def mergeMaps(a: Column, b: Column): Column =
      map_zip_with(a, b,
        (_, v1, v2) => when(v1.isNull, v2).when(v2.isNull, v1)
          .otherwise(array_sort(array_union(v1, v2))))

    // includeResourceURI (about=[subj] into the shared doc) and A5
    // normMissing (per-predicate defaults where the untagged map lacks the
    // predicate) are ROW-LOCAL map edits applied to the aggregated shared
    // doc — r6 restructure (guide §2.4): the former pre-aggregation row
    // unions paid a distinct-subjects exchange (about), a distinct
    // (subj, pred) exchange plus an anti-join (defaults), and re-shuffled
    // the synthetic rows through the value aggregation; the map edits cost
    // nothing but per-row work and are value-identical because collect_set
    // + array_sort over the synthetic rows equals the sorted-distinct
    // literal (defaults) / the sorted union with [subj] (about, via the
    // same A6 merge kernel). Reference semantics preserved: about inserts
    // BEFORE the missing judgment (an 'about' default would see it
    // present), absence is judged on the UNTAGGED map alone, and a subject
    // holding a defaulted predicate only under a language tag still
    // receives the default, which then unions into its tagged docs via the
    // shared merge (bug-compatible by design, ESNormalizer.java:127-155).
    // Defaults skip label resolution (applied after resolveUriLabels).
    val aboutMap = map(lit("about"), array(col("subj")))
    def withAbout(m: Column): Column =
      if (!cfg.includeResourceURI) m else mergeMaps(m, aboutMap)
    val defaultsLit: Option[Column] =
      if (cfg.normMissing.isEmpty) None
      else {
        val entries = cfg.normMissing.toSeq.sortBy(_._1)
        Some(map_from_arrays(
          array(entries.map { case (p, _) => lit(p) }: _*),
          array(entries.map { case (_, vs) =>
            array_sort(array_distinct(array(vs.map(lit): _*))) }: _*)))
      }
    def fill(m: Column): Column = defaultsLit match {
      case None => m
      case Some(dl) =>
        map_concat(m, map_filter(dl, (k, _) => !map_contains_key(m, k)))
    }
    // the full shared doc of a subject that HAS untagged rows ...
    val sharedDocExpr = fill(withAbout(col("shared_doc")))
    // ... and of one that has none (about/defaults still apply there)
    val fallbackDoc: Option[Column] =
      (cfg.includeResourceURI, defaultsLit) match {
        case (true, Some(_)) => Some(fill(aboutMap))
        case (true, None) => Some(aboutMap)
        case (false, Some(dl)) => Some(dl)
        case (false, None) => None
      }

    val shared = perLang.filter(col("lang") === "")
      .select(col("subj"), col("doc").as("shared_doc"))
    val tagged = perLang.filter(col("lang") =!= "")

    // A6: merge shared props into every tagged doc; union value lists per key
    val mergedTagged = tagged.join(shared, Seq("subj"), "left")
      .select(col("subj"), col("lang"),
        when(col("shared_doc").isNull, fallbackDoc match {
          case None => col("doc")
          case Some(fb) => mergeMaps(col("doc"), fb)
        }).otherwise(mergeMaps(col("doc"), sharedDocExpr)).as("doc"))

    // language stamp (tagged docs only; put-overwrite semantics)
    val stampedTagged =
      if (!cfg.addLanguage) mergedTagged
      else mergedTagged.withColumn("doc",
        map_concat(
          map_filter(col("doc"), (k, _) => k =!= "language"),
          map(lit("language"), array(col("lang")))))

    // subjects with only untagged values: one doc at the default language
    // (about/defaults applied with the same row-local edits)
    val untaggedOnly = shared
      .join(tagged.select("subj").distinct(), Seq("subj"), "left_anti")
      .select(col("subj"), lit(cfg.language).as("lang"),
        sharedDocExpr.as("doc"))

    val docs = stampedTagged.unionByName(untaggedOnly)
      .withColumn("id", concat_ws("@", col("subj"), col("lang")))

    val withCounts = if (addCounting) {
      docs.withColumn("doc", map_concat(col("doc"),
        map_from_entries(transform(map_entries(col("doc")),
          e => struct(
            concat(lit("items_count_"), e.getField("key")),
            array(size(e.getField("value")).cast("string")))))))
    } else docs

    withCounts.select("id", "subj", "lang", "doc")
  }
}
