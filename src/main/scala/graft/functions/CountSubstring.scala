package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd OVERLAPPING substring count: the number of character
  * positions i where `pattern` starts in `text` ("aaaa" contains "aaa"
  * twice). This is the standard n-gram occurrence definition — the one the
  * char-trigram language-ID oracle enumerates positionally — which rules
  * out the built-in alternatives: `regexp_count` is non-overlapping (and
  * needs quoting), `(length(t)-length(replace(t,p,'')))/len` is
  * non-overlapping too, and the position-explode form allocates one
  * substring object PER CHARACTER of the corpus just to test membership.
  *
  * Why a custom Expression (preference order (b) in SURVEY.md §7.3): the
  * count compiles to one UTF8String.indexOf loop inside whole-stage
  * codegen — no Generate/explode, no per-position allocation, no shuffle.
  * An empty pattern counts 0 (the SQL-friendly guard; a position-based
  * definition would be degenerate anyway). */
case class CountSubstring(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(t: Any, p: Any): Any = {
    val text = t.asInstanceOf[UTF8String]
    val pat = p.asInstanceOf[UTF8String]
    if (pat.numChars() == 0) 0L
    else {
      var c = 0L
      var from = 0
      var at = text.indexOf(pat, from)
      while (at >= 0) {
        c += 1
        from = at + 1
        at = text.indexOf(pat, from)
      }
      c
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, p) => {
      val c = ctx.freshName("c")
      val at = ctx.freshName("at")
      val from = ctx.freshName("from")
      s"""
         |long $c = 0L;
         |if ($p.numChars() > 0) {
         |  int $from = 0;
         |  int $at = $t.indexOf($p, $from);
         |  while ($at >= 0) {
         |    $c += 1L;
         |    $from = $at + 1;
         |    $at = $t.indexOf($p, $from);
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountSubstring =
    copy(left = newLeft, right = newRight)
}

object CountSubstring {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-level entry: overlapping occurrences of `pattern` in `text`. */
  def count(text: Column, pattern: Column): Column =
    ColumnBridge.column(
      CountSubstring(ColumnBridge.expression(text), ColumnBridge.expression(pattern)))
}
