package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.link.EntityLinker
import graft.schema.{CatalogEntry, Turn}

class EntityLinkerSpec extends AnyFunSuite {

  private def turn(text: String, idx: Int = 0) =
    Turn("c1", idx, "user", text, null, new Timestamp(0))

  test("ambiguous alias resolves to the candidate with best context overlap") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val catalog = Seq(
      CatalogEntry("urn:ent:java_lang", "java", "java language compiler jvm", 1),
      CatalogEntry("urn:ent:java_island", "java", "java island indonesia sea", 1))
    val turns = Seq(
      turn("the java compiler targets the jvm", 0),
      turn("sailing near java in indonesia", 1)).toDS()
    val got = EntityLinker.link(turns, catalog).collect()
      .map(r => (r.getInt(1), r.getString(3))).toMap
    assert(got(0) == "urn:ent:java_lang")
    assert(got(1) == "urn:ent:java_island")
  }

  test("rank breaks exact score ties deterministically (W3 first-match-wins)") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val catalog = Seq(
      CatalogEntry("urn:ent:b", "x", "same words", 2),
      CatalogEntry("urn:ent:a", "x", "same words", 1))
    val got = EntityLinker.link(Seq(turn("x alone")).toDS(), catalog).collect()
    assert(got.length == 1 && got.head.getString(3) == "urn:ent:a")
  }

  test("text is cleaned before tokenizing (stress chars do not break mentions)") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val catalog = Seq(CatalogEntry("urn:ent:a", "spark", "spark engine", 1))
    val got = EntityLinker.link(
      Seq(turn("\tspark\nrocks")).toDS(), catalog).collect()
    assert(got.length == 1 && got.head.getString(3) == "urn:ent:a")
  }
}
