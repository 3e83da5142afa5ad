package graft.materialize

import org.apache.spark.sql.DataFrame
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
  *  - F7: doc id = subj@lang (Harvester.java:1852-1853) — the MERGE key.
  *  - A7: optional items_count_<pred> entries (dead code in the reference,
  *    call site commented out at Harvester.java:1845-1848 — implemented
  *    behind `addCounting`, default off, matching observable behavior).
  *
  * Everything is hash aggregation + one broadcast-sized self-join on subj —
  * no per-doc driver work, scales with the subject count.
  */
object DocAssembler {

  /** @param triples columns (subj, pred, obj, lang); lang "" = untagged.
    * @return (id, subj, lang, doc: Map[String, Array[String]]) */
  def assemble(triples: DataFrame, cfg: PipelineConfig,
               addCounting: Boolean = false): DataFrame = {
    val vals = triples
      .groupBy("subj", "lang", "pred")
      .agg(array_sort(collect_set(col("obj"))).as("vals"))
      .filter(size(col("vals")) > 0) // P3

    val perLang = vals
      .groupBy("subj", "lang")
      .agg(map_from_entries(collect_list(struct(col("pred"), col("vals")))).as("doc"))

    val shared = perLang.filter(col("lang") === "")
      .select(col("subj"), col("doc").as("shared_doc"))
    val tagged = perLang.filter(col("lang") =!= "")

    // A6: merge shared props into every tagged doc; union value lists per key
    val mergedTagged = tagged.join(shared, Seq("subj"), "left")
      .select(col("subj"), col("lang"),
        when(col("shared_doc").isNull, col("doc")).otherwise(
          map_zip_with(col("doc"),
            col("shared_doc"),
            (_, v1, v2) => when(v1.isNull, v2).when(v2.isNull, v1)
              .otherwise(array_sort(array_union(v1, v2))))).as("doc"))

    // subjects with only untagged values: one doc at the default language
    val untaggedOnly = shared
      .join(tagged.select("subj").distinct(), Seq("subj"), "left_anti")
      .select(col("subj"), lit(cfg.language).as("lang"),
        col("shared_doc").as("doc"))

    val docs = mergedTagged.unionByName(untaggedOnly)
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
