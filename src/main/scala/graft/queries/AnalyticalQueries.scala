package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.AsOfJoin

/** Deeper analytical shapes over the star schema: multi-join aggregations
  * (TPC-H Q3/Q5/Q10 style), as-of attribution, and exact percentiles — the
  * "query capabilities" surface of the engine beyond the reference's
  * operator set. Decimal arithmetic + full deterministic ordering keeps
  * every oracle bit-exact. */
object AnalyticalQueries {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,4)")).cast("double")

  val all: Map[String, Q] = Map(

    // ---- Q3-style: shipping priority — 3-way join, filter both sides,
    // top-10 revenue
    "q3_shipping_priority" -> Q(
      """SELECT l.l_orderkey,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
        |  o.o_orderdate
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l.l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l.l_orderkey, o.o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(sum(col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1) - col("l_discount").cast("decimal(18,4)")))
          .cast("double").as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // ---- Q5-style: local-supplier volume — 5-way join through both
    // dimension chains, group by region
    "q5_region_volume" -> Q(
      """SELECT r.r_name,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
        |GROUP BY r.r_name ORDER BY r_name""".stripMargin) { (s, d) =>
      val l = Tables.lineitem(s, d)
      val sup = broadcast(Tables.supplier(s, d))
      val n = broadcast(Tables.nation(s, d))
      val r = broadcast(Tables.region(s, d))
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp"))
      l.join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(n, sup("s_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy("r_name")
        .agg(sum(col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1) - col("l_discount").cast("decimal(18,4)")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("r_name")
    },

    // ---- Q10-style: returned-item customers ranked by lost revenue
    "q10_returned_revenue" -> Q(
      """SELECT c.c_custkey, c.c_name,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_returnflag = 'R'
        |GROUP BY c.c_custkey, c.c_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(sum(col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1) - col("l_discount").cast("decimal(18,4)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // ---- as-of attribution: for each purchase, the most recent prior click
    // of the same user — the scalable union+window formulation (no pairwise
    // range join; see graft.operators.AsOfJoin)
    "j6_asof_attribution" -> Q(
      """WITH u AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN event_type = 'click' THEN ts END AS click_ts,
        |         event_type
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |w AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         max(click_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
        |  FROM u)
        |SELECT user_id, event_id, ts, last_click_ts
        |FROM w WHERE event_type = 'purchase' ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
      AsOfJoin.lastPriorEvent(ev,
        partitionCols = Seq("user_id"),
        orderCols = Seq("ts", "event_id"),
        markerCond = col("event_type") === "click",
        markerValue = col("ts"),
        as = "last_click_ts")
        .filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts", "last_click_ts")
        .orderBy("user_id", "event_id")
    },

    // ---- exact interpolated percentiles per group (the engine's quantile
    // surface; approximate HLL/quantiles are spec-checked for error bounds,
    // not oracle-compared)
    "agg_percentiles" -> Q(
      """SELECT event_type,
        |       round(quantile_cont(value, 0.5), 6) AS p50,
        |       round(quantile_cont(value, 0.95), 6) AS p95
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.95)"), 6).as("p95"))
        .orderBy("event_type")
    },

    // ---- range join via interval bucketing: events matched to OVERLAPPING
    // value tiers. The naive formulation is a theta-join (value BETWEEN lo
    // AND hi), which Spark can only execute as a nested-loop — fine for a
    // broadcast dim, fatal when both sides are large. The scale path used
    // here: expand each tier to its covering fixed-width buckets (a few
    // hundred rows, still broadcast), join on floor(value/w) EQUALITY, and
    // re-check the exact bounds as a residual filter. The join stays a
    // broadcast HASH join (plan-locked) and the same shape works
    // large-to-large with a shuffle hash join on the bucket key.
    "j7_range_bucket_join" -> Q(
      """WITH tiers(tier, lo, hi) AS (VALUES
        |  ('micro', 0.0, 2.5), ('small', 2.5, 10.0), ('mid', 5.0, 50.0),
        |  ('large', 50.0, 250.0), ('huge', 250.0, 1000.0), ('all', 0.0, 1000.0)),
        |j AS (SELECT t.tier, e.value
        |      FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi)
        |SELECT tier, count(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM j GROUP BY tier ORDER BY tier""".stripMargin) { (s, d) =>
      import s.implicits._
      val w = 2.5
      val tiers = Seq(
        ("micro", 0.0, 2.5), ("small", 2.5, 10.0), ("mid", 5.0, 50.0),
        ("large", 50.0, 250.0), ("huge", 250.0, 1000.0), ("all", 0.0, 1000.0))
      // expand [lo, hi) to covering bucket indices; hi exclusive, so a
      // boundary-aligned hi contributes no extra bucket (ceil(hi/w) - 1)
      val expanded = broadcast(tiers.toDF("tier", "lo", "hi")
        .select(col("tier"), col("lo"), col("hi"),
          explode(sequence(
            floor(col("lo") / w).cast("int"),
            (ceil(col("hi") / w) - 1).cast("int"))).as("bucket")))
      Tables.events(s, d)
        .select(col("value"), floor(col("value") / w).cast("int").as("bucket"))
        .join(expanded, "bucket")
        .filter(col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy("tier")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("tier")
    },

    // ---- approximate distinct (HLL++): engine-specific sketch, so no
    // cross-engine oracle — the driver records rows-only; the <2% error
    // bound vs exact is asserted in ApproxSpec
    "agg_approx_distinct" -> Q.noOracle { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
        .orderBy("event_type")
    }
  )
}
