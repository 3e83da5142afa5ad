package graft.schema

import java.sql.Timestamp

/** Core row types of the KG-construction pipeline (SURVEY.md §7.1 module 1).
  *
  * `Turn` is exactly `BASELINE.json`'s `input_hint` schema. `Triple` is the
  * universal IR — the Spark-native stand-in for the reference's Jena
  * `Statement` in an in-memory `Model` (Harvester.java:1578-1581): set
  * semantics are realized by `dropDuplicates` on the triple key, not by a
  * driver-side graph object.
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** One (subject, predicate, object) statement. `objLang` mirrors the RDF
  * literal language tag that routes values into per-language documents
  * (ESNormalizer.java:190-194); `objType` mirrors the literal datatype
  * dispatch (ESNormalizer.java:349-393). */
final case class Triple(
    subj: String,
    pred: String,
    obj: String,
    objLang: String,
    objType: String)

/** A detected surface-form occurrence in a turn, before linking. */
final case class Mention(
    conv_id: String,
    turn_idx: Int,
    surface: String,
    startTok: Int)

/** Broadcast dictionary row for entity linking (mirrors the reference's
  * uriDescriptionList label sources, EEASettings.java:46-50 — first-match
  * priority is `rank`). */
final case class CatalogEntry(
    entityId: String,
    alias: String,
    prefLabel: String,
    rank: Int)

/** Extraction rule: a phrase that signals a predicate between two mentions
  * (the graft analogue of the river's proplist/normProp config,
  * Indexer.java:350-463). */
final case class PredicateRule(
    pattern: String,
    pred: String,
    renames: Seq[String],
    listed: String)

/** Edge of the materialized graph. */
final case class Edge(
    src: String,
    pred: String,
    dst: String,
    lang: String,
    weight: Long)

/** Node of the materialized graph with its canonical representative after
  * connected-components canonicalization. */
final case class Node(
    entityId: String,
    canonicalId: String,
    label: String)

/** Per-run, per-partition metrics row (reference analogue: UpdateRecord,
  * Harvester.java:1894-1904). */
final case class RunMetrics(
    runId: String,
    stage: String,
    metric: String,
    value: Long)
