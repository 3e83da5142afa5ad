package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextNorm

/** Char-exact parity vectors for the per-turn text-equality invariant.
  * Cases replicate the reference unit tests (HarvesterTest.java:294-315) and
  * the `parseForJson` contract (EEASettings.java:56-63). */
class TextNormSpec extends AnyFunSuite {

  test("reference free-text vector (HarvesterTest.java:294-315)") {
    assert(TextNorm.parseForJson("\"This is a \nfree te\rxt") ==
      "'This is a  free te xt")
  }

  test("trim matches Java String.trim (all chars <= 0x20)") {
    assert(TextNorm.parseForJson("  hi ") == "hi")
    assert(TextNorm.parseForJson("  x  ") == "x")
  }

  test("newline and carriage return become single spaces") {
    assert(TextNorm.parseForJson("a\nb\rc") == "a b c")
  }

  test("double quote becomes single quote") {
    assert(TextNorm.parseForJson("say \"hi\"") == "say 'hi'")
  }

  test("tab becomes four spaces") {
    assert(TextNorm.parseForJson("a\tb") == "a    b")
  }

  test("escaped quote is unescaped (order: after quote replacement)") {
    // \" -> \' (step 3) -> ' (step 5)
    assert(TextNorm.parseForJson("a\\\"b") == "a'b")
    assert(TextNorm.parseForJson("a\\'b") == "a'b")
  }

  test("hex escapes collapse to underscore") {
    assert(TextNorm.parseForJson("a\\xAFb") == "a_b")
    assert(TextNorm.parseForJson("a\\xzzb") == "a\\\\xzzb") // not hex: backslash doubled
  }

  test("lone backslash is doubled") {
    assert(TextNorm.parseForJson("a\\b") == "a\\\\b")
  }

  test("reference java-chain equivalence on generated strings") {
    // Independent model of EEASettings.parseForJson, built step-by-step.
    def javaChain(s: String): String = {
      var t = s.trim
      t = t.replaceAll("[\n\r]", " ")
      t = t.replace('"', '\'')
      t = t.replace("\t", "    ")
      t = t.replace("\\'", "'")
      t = t.replaceAll("\\\\x[a-fA-F0-9][a-fA-F0-9]", "_")
      t = t.replace("\\", "\\\\")
      t
    }
    val alphabet = ('a' to 'f') ++ Seq('"', '\\', '\n', '\r', '\t', 'x', 'F', '0', '9', ' ')
    val rnd = new scala.util.Random(42)
    (1 to 20000).foreach { _ =>
      val str = Seq.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.size))).mkString
      assert(TextNorm.parseForJson(str) == javaChain(str), s"input=" + str.map(_.toInt))
    }
  }

  test("column form matches pure-scala form (via Spark)") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val samples = Seq(
      "\"This is a \nfree te\rxt", "a\tb\\'c", "x\\xAF\\xzz", "  pad  ",
      "q\"w\\\"e", "back\\slash", "ctl", "", "plain text",
      "multi\n\nline\r\r", "\\x41\\x4g", "tab\t\ttab")
    val df = samples.toDF("t")
    val got = df.select(TextNorm.parseForJsonCol(org.apache.spark.sql.functions.col("t")))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    val want = samples.map(TextNorm.parseForJson)
    assert(got.toSeq == want)
  }
}
