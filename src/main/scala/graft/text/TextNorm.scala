package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Char-exact re-implementation of the reference's per-row text-normalization
  * invariant ("per-turn text equality" contract of the north rule).
  *
  * Reference: `EEASettings.parseForJson` (EEASettings.java:56-63) applies, in
  * order: trim; `[\n\r]` -> space; `"` -> `'`; tab -> 4 spaces; `\'` -> `'`;
  * `\xNN` -> `_`; `\` -> `\\`. The order matters (e.g. `\"` first becomes
  * `\'` in step 3 and is then unescaped by step 5).
  *
  * Reference: `EEASettings.removeIllegalXMLChar` (EEASettings.java:65-69)
  * discards the result of `replaceAll` — a latent no-op bug. We expose both
  * the bug-compatible identity and the intended strip (SURVEY.md P6).
  */
object TextNorm {

  /** Pure-Scala parity implementation (used by golden-fixture generators and
    * unit vectors; semantics identical to the Column form below). */
  def parseForJson(text: String): String =
    text.trim
      .replaceAll("[\n\r]", " ")
      .replace('"', '\'')
      .replace("\t", "    ")
      .replace("\\'", "'")
      .replaceAll("\\\\x[a-fA-F0-9][a-fA-F0-9]", "_")
      .replace("\\", "\\\\")

  /** Catalyst Column form — stays inside whole-stage codegen (regexp_replace
    * and translate are codegen'd built-ins; no UDF).
    *
    * NOTE: Java's `String.trim` strips every char <= U+0020 — not just
    * spaces like Spark's `trim` — so the Column form emulates it with a
    * regexp to stay char-exact. */
  def parseForJsonCol(c: Column): Column = {
    val t1 = regexp_replace(c, "^[\\x00-\\x20]+|[\\x00-\\x20]+$", "")
    val t2 = regexp_replace(t1, "[\\n\\r]", " ")
    val t3 = translate(t2, "\"", "'")
    val t4 = regexp_replace(t3, "\\t", "    ")
    val t5 = regexp_replace(t4, "\\\\'", "'")
    val t6 = regexp_replace(t5, "\\\\x[a-fA-F0-9][a-fA-F0-9]", "_")
    regexp_replace(t6, "\\\\", "\\\\\\\\")
  }

  /** Bug-compatible `removeIllegalXMLChar`: the reference ignores the
    * replaced string, so the observable behavior is identity. */
  def removeIllegalXmlCharBugCompatible(text: String): String = text

  private val IllegalXml = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"

  /** The *intended* behavior of removeIllegalXMLChar (documented divergence —
    * SURVEY.md P6): strip XML-illegal control chars. */
  def removeIllegalXmlCharsIntended(c: Column): Column =
    regexp_replace(c, IllegalXml, "")

  def removeIllegalXmlCharsIntended(text: String): String =
    text.replaceAll(IllegalXml, "")

  /** Whitespace tokenizer shared by extraction / scoring / dedup paths. */
  def tokensCol(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => length(t) > 0)
}
