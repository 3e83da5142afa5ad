package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CountSubstring, DotProduct}

/** SparkSessionExtensions entry point — makes the engine's native Catalyst
  * expressions available to pure-SQL users:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   SELECT graft_dot(a.embedding, b.embedding) FROM ...
  *
  * (Public injection API; for an already-running session use
  * `GraftExtensions.register(spark)`.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.graftbridge.ColumnBridge.requireArity

  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        requireArity("graft_dot", 2, exprs)
        DotProduct(exprs(0), exprs(1))
      }))
    // graft_count_substr: OVERLAPPING substring occurrences (the positional
    // n-gram count; regexp_count is non-overlapping and needs quoting).
    e.injectFunction((
      FunctionIdentifier("graft_count_substr"),
      new ExpressionInfo(classOf[CountSubstring].getName, "graft_count_substr"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        requireArity("graft_count_substr", 2, exprs)
        CountSubstring(exprs(0), exprs(1))
      }))
    // graft_clean: the char-exact parseForJson chain (P5) for SQL users.
    // Composes codegen'd built-ins (TextNorm.parseForJsonCol), so the
    // injected expression is the composition's root — no UDF wall.
    e.injectFunction((
      FunctionIdentifier("graft_clean"),
      new ExpressionInfo(graft.text.TextNorm.getClass.getName, "graft_clean"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.text.TextNorm.parseForJsonExpr(
          requireArity("graft_clean", 1, exprs).head)))
    // graft_fingerprint: THE order-insensitive near-dup key shared by the
    // dedup family (TextNorm.fingerprintCol), for ad-hoc SQL joins against
    // the dedup index.
    e.injectFunction((
      FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(graft.text.TextNorm.getClass.getName, "graft_fingerprint"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.text.TextNorm.fingerprintExpr(
          requireArity("graft_fingerprint", 1, exprs).head)))
  }
}

object GraftExtensions {
  /** Runtime registration into an existing session. */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graftbridge.FunctionBridge.registerAll(spark)

  /** Register every driver table of an sf directory as a temp view, so the
    * whole surface is queryable with spark.sql. */
  def registerTables(spark: SparkSession, sfDir: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      Tables(spark, sfDir, t).createOrReplaceTempView(t)
    }
}
