package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{AnalysisException, Column}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column<->Expression converters (Spark
  * 4 moved them behind org.apache.spark.sql.classic). Lives in a
  * subpackage of org.apache.spark.sql for access — the standard pattern for
  * libraries that define native Catalyst expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Arity gate for SQL-exposed function builders: a wrong argument count
    * surfaces as the same AnalysisException Spark's own builtins raise
    * (WRONG_NUM_ARGS, sqlState 42605) instead of an IndexOutOfBounds
    * internal error — and extra arguments are rejected, never silently
    * dropped. */
  def requireArity(name: String, expected: Int, exprs: Seq[Expression]): Seq[Expression] = {
    if (exprs.length != expected)
      throw new AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> expected.toString,
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    exprs
  }
}

/** Runtime function registration (sessionState is private[sql]). Registers
  * the WHOLE graft SQL surface: graft_dot, graft_clean, graft_fingerprint. */
object FunctionBridge {
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_dot",
      exprs => { ColumnBridge.requireArity("graft_dot", 2, exprs)
        graft.functions.DotProduct(exprs(0), exprs(1)) },
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_clean",
      exprs => graft.text.TextNorm.parseForJsonExpr(
        ColumnBridge.requireArity("graft_clean", 1, exprs).head),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_fingerprint",
      exprs => graft.text.TextNorm.fingerprintExpr(
        ColumnBridge.requireArity("graft_fingerprint", 1, exprs).head),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_count_substr",
      exprs => { ColumnBridge.requireArity("graft_count_substr", 2, exprs)
        graft.functions.CountSubstring(exprs(0), exprs(1)) },
      "built-in")
  }
}
