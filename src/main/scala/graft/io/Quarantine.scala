package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-row quarantine — the Spark-native form of the reference's
  * failure-granularity shrink (K2: a failed 30-doc bulk is retried one URI
  * at a time and second failures are recorded, Harvester.java:1281-1432,
  * 1913-1928). Spark task retries cover transient failures; rows that are
  * structurally bad deterministically fail every retry, so they are split
  * out *before* the kernel into a quarantine table with a reason column —
  * the pipeline keeps moving and nothing is silently dropped.
  */
object Quarantine {

  final case class Check(name: String, passes: Column)

  /** Standard validity checks for the transcript input contract. */
  def turnChecks: Seq[Check] = Seq(
    Check("null_conv_id", col("conv_id").isNotNull),
    Check("null_turn_idx", col("turn_idx").isNotNull),
    Check("negative_turn_idx", col("turn_idx").isNull || col("turn_idx") >= 0),
    Check("null_text", col("text").isNotNull))

  /** First failing check (in order), null when every check passes — the
    * single source of the quarantine predicate (split and any observe-side
    * bad-row count must agree exactly). */
  def reasonCol(checks: Seq[Check]): Column =
    checks.foldRight(lit(null).cast("string")) { (c, acc) =>
      when(!c.passes, c.name).otherwise(acc)
    }

  /** @return (good rows, quarantined rows + `quarantine_reason`). The reason
    *         is the first failing check, evaluated in order. */
  def split(df: DataFrame, checks: Seq[Check]): (DataFrame, DataFrame) = {
    val tagged = df.withColumn("quarantine_reason", reasonCol(checks))
    (tagged.filter(col("quarantine_reason").isNull).drop("quarantine_reason"),
      tagged.filter(col("quarantine_reason").isNotNull))
  }
}
