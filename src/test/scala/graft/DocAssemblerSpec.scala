package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.PipelineConfig
import graft.materialize.DocAssembler

class DocAssemblerSpec extends AnyFunSuite {

  private def docsOf(addCounting: Boolean = false) = {
    val spark = SparkTestSession.get
    import spark.implicits._
    val triples = Seq(
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
    DocAssembler.assemble(triples, PipelineConfig(language = "en"), addCounting)
      .collect()
      .map(r => r.getString(0) ->
        r.getMap[String, scala.collection.Seq[String]](3).toMap
          .map { case (k, v) => k -> v.toList })
      .toMap
  }

  test("A6 shared props merge into every tagged language; F7 id = subj@lang") {
    val docs = docsOf()
    assert(docs.keySet == Set("s1@en", "s1@cs", "s2@en"))
    assert(docs("s1@en") == Map(
      "p_title" -> List("hello", "shared-title"), "p_type" -> List("thing")))
    assert(docs("s1@cs") == Map(
      "p_title" -> List("ahoj", "shared-title"), "p_type" -> List("thing")))
  }

  test("untagged-only subject keeps one doc at the configured language") {
    assert(docsOf()("s2@en") == Map("p_type" -> List("only-shared")))
  }

  test("A7 addCounting adds items_count_<pred> entries when enabled") {
    val docs = docsOf(addCounting = true)
    assert(docs("s1@en")("items_count_p_title") == List("2"))
    assert(docs("s1@en")("items_count_p_type") == List("1"))
    // default off: no counting keys
    assert(!docsOf()("s1@en").keys.exists(_.startsWith("items_count")))
  }
}
