package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column<->Expression converters (Spark
  * 4 moved them behind org.apache.spark.sql.classic). Lives in a
  * subpackage of org.apache.spark.sql for access — the standard pattern for
  * libraries that define native Catalyst expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Runtime function registration (sessionState is private[sql]). */
object FunctionBridge {
  def registerDot(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_dot",
      exprs => graft.functions.DotProduct(exprs(0), exprs(1)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_clean",
      exprs => graft.text.TextNorm.parseForJsonExpr(exprs(0)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_fingerprint",
      exprs => graft.text.TextNorm.fingerprintExpr(exprs(0)),
      "built-in")
  }
}
