package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.PipelineConfig
import graft.materialize.DocAssembler

class DocAssemblerSpec extends AnyFunSuite {

  private def triplesDf = {
    val spark = SparkTestSession.get
    import spark.implicits._
    Seq(
      // s1: tagged en + cs, plus shared ("") props
      ("s1", "p_title", "hello", "en"),
      ("s1", "p_title", "ahoj", "cs"),
      ("s1", "p_type", "thing", ""),
      ("s1", "p_title", "shared-title", ""),
      // duplicate value dedups (A2)
      ("s1", "p_title", "hello", "en"),
      // s2: untagged only -> default language doc
      ("s2", "p_type", "only-shared", ""))
      .toDF("subj", "pred", "obj", "lang")
  }

  private def docsOf(cfg: PipelineConfig = PipelineConfig(language = "en"),
                     addCounting: Boolean = false) =
    DocAssembler.assemble(triplesDf, cfg, addCounting)
      .collect()
      .map(r => r.getString(0) ->
        r.getMap[String, scala.collection.Seq[String]](3).toMap
          .map { case (k, v) => k -> v.toList })
      .toMap

  // reference behavior: language-tagged docs are stamped unconditionally
  // (ESNormalizer.java:193-194); untagged-only docs never are
  test("A6 shared props merge into every tagged language; F7 id = subj@lang; " +
       "addLanguage stamps tagged docs") {
    val docs = docsOf()
    assert(docs.keySet == Set("s1@en", "s1@cs", "s2@en"))
    assert(docs("s1@en") == Map(
      "p_title" -> List("hello", "shared-title"), "p_type" -> List("thing"),
      "language" -> List("en")))
    assert(docs("s1@cs") == Map(
      "p_title" -> List("ahoj", "shared-title"), "p_type" -> List("thing"),
      "language" -> List("cs")))
  }

  test("untagged-only subject keeps one doc at the configured language, unstamped") {
    assert(docsOf()("s2@en") == Map("p_type" -> List("only-shared")))
  }

  test("addLanguage=false suppresses the language property") {
    val docs = docsOf(PipelineConfig(language = "en", addLanguage = false))
    assert(!docs("s1@en").contains("language"))
    assert(!docs("s1@cs").contains("language"))
  }

  test("includeResourceURI adds about=[subj] via the shared doc (all docs)") {
    val docs = docsOf(PipelineConfig(language = "en", includeResourceURI = true))
    assert(docs("s1@en")("about") == List("s1"))
    assert(docs("s1@cs")("about") == List("s1"))
    assert(docs("s2@en")("about") == List("s2")) // untagged-only path too
    // default off: absent
    assert(!docsOf()("s1@en").contains("about"))
  }

  test("normMissing fills defaults by untagged-map absence (reference-exact): " +
       "tagged-only subjects still get them; untagged holders do not") {
    val cfg = PipelineConfig(language = "en",
      normMissing = Map("p_title" -> Seq("untitled"), "p_flag" -> Seq("a", "b")))
    val docs = docsOf(cfg)
    // s1 HAS an untagged p_title ("shared-title") -> no default for it;
    // p_flag is absent everywhere -> defaults land in the shared map and
    // union into every tagged doc
    assert(docs("s1@en")("p_title") == List("hello", "shared-title"))
    assert(docs("s1@en")("p_flag") == List("a", "b"))
    assert(docs("s1@cs")("p_flag") == List("a", "b"))
    // s2 (untagged-only) lacks p_title entirely -> default fills its doc
    assert(docs("s2@en")("p_title") == List("untitled"))
    assert(docs("s2@en")("p_flag") == List("a", "b"))

    // the bug-compatible branch: a subject holding the predicate ONLY under
    // a language tag still receives the default (absence is judged on the
    // untagged map alone, ESNormalizer.java:127-134), and the default unions
    // with the tagged values via the shared merge
    val spark = SparkTestSession.get
    import spark.implicits._
    val taggedOnly = Seq(("s3", "p_title", "tagged-title", "en"))
      .toDF("subj", "pred", "obj", "lang")
    val got = DocAssembler.assemble(taggedOnly,
        PipelineConfig(language = "en", normMissing = Map("p_title" -> Seq("untitled"))))
      .collect()
      .map(r => r.getString(0) ->
        r.getMap[String, scala.collection.Seq[String]](3).toMap
          .map { case (k, v) => k -> v.toList })
      .toMap
    assert(got("s3@en")("p_title") == List("tagged-title", "untitled"))
  }

  test("uriDescription label substitution: priority first-match, URI fallback") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val t = Seq(
      // e1 described by both prefLabel and title -> prefLabel wins
      ("e1", "prefLabel", "Entity One", ""),
      ("e1", "title", "T-One", ""),
      // e2 described by title only
      ("e2", "title", "T-Two", ""),
      // references: objects e1/e2 substitute, e3 (no labels) passes through
      ("s1", "p_ref", "e1", "en"),
      ("s1", "p_ref", "e2", "en"),
      ("s1", "p_ref", "e3", "en"))
      .toDF("subj", "pred", "obj", "lang")
    val cfg = PipelineConfig(uriDescription = Seq("prefLabel", "title"))
    val got = DocAssembler.resolveUriLabels(t, cfg)
      .filter(org.apache.spark.sql.functions.col("pred") === "p_ref")
      .select("obj").collect().map(_.getString(0)).toSet
    assert(got == Set("Entity One", "T-Two", "e3"))
  }

  test("empty uriDescription disables substitution") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val t = Seq(("e1", "title", "T", ""), ("s1", "p_ref", "e1", "en"))
      .toDF("subj", "pred", "obj", "lang")
    val got = DocAssembler.resolveUriLabels(t,
        PipelineConfig(uriDescription = Seq.empty))
      .filter(org.apache.spark.sql.functions.col("pred") === "p_ref")
      .select("obj").collect().map(_.getString(0)).toSet
    assert(got == Set("e1"))
  }

  test("A7 addCounting adds items_count_<pred> entries when enabled") {
    val noLang = PipelineConfig(language = "en", addLanguage = false)
    val docs = docsOf(noLang, addCounting = true)
    assert(docs("s1@en")("items_count_p_title") == List("2"))
    assert(docs("s1@en")("items_count_p_type") == List("1"))
    // default off: no counting keys
    assert(!docsOf(noLang)("s1@en").keys.exists(_.startsWith("items_count")))
  }

  test("typedJsonValue always emits valid JSON: control chars escape, bad " +
       "numeric lexicals quote") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val xsd = "http://www.w3.org/2001/XMLSchema#"
    val rows = Seq(
      ("42", s"${xsd}integer"),        // -> 42
      ("-1.5e3", s"${xsd}double"),     // -> -1.5e3
      ("true", s"${xsd}boolean"),      // -> true
      ("NaN", s"${xsd}double"),        // invalid JSON token -> quoted
      ("abc", s"${xsd}integer"),       // invalid lexical -> quoted
      ("0123", s"${xsd}integer"),      // valid xsd, INVALID JSON (leading 0)
      ("yes", s"${xsd}boolean"),       // invalid lexical -> quoted
      ("line1\nline2\ttab", ""), // control chars escape/strip
      ("quote \" back \\", ""))
      .toDF("obj", "otype")
    import org.apache.spark.sql.functions.col
    val got = rows.select(col("obj"),
        DocAssembler.typedJsonValue(col("obj"), col("otype")).as("j"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("42") == "42")
    assert(got("-1.5e3") == "-1.5e3")
    assert(got("true") == "true")
    assert(got("NaN") == "\"NaN\"")
    assert(got("abc") == "\"abc\"")
    assert(got("0123") == "\"0123\"") // RFC 8259 forbids leading zeros
    assert(got("yes") == "\"yes\"")
    assert(got("line1\nline2\ttab") == "\"line1\\nline2\\ttab\"")
    assert(got("quote \" back \\") == "\"quote \\\" back \\\\\"")
    // every rendered value must be a parseable JSON token (RFC 8259)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    got.values.foreach(v => mapper.readTree(v))
  }

  test("config JSON round-trip consumes addLanguage/uriDescription/includeResourceURI") {
    val cfg = graft.config.ConfigParsing.fromJson(
      """{"config":{"eeaRDF":{
        |  "language": "cs",
        |  "addLanguage": false,
        |  "includeResourceURI": true,
        |  "uriDescription": "[skos:prefLabel,dc:title]"
        |}}}""".stripMargin)
    assert(!cfg.addLanguage)
    assert(cfg.includeResourceURI)
    assert(cfg.uriDescription == Seq("skos:prefLabel", "dc:title"))
  }
}
