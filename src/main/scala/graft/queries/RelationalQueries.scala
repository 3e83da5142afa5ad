package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextNorm

/** SURVEY.md §2 operator inventory, re-expressed as Catalyst-first DataFrame
  * programs over the driver's parquet tables, each with a DuckDB oracle.
  *
  * Float-parity discipline: every SUM over a double column is computed in
  * exact DECIMAL arithmetic and cast to DOUBLE at the end, so Spark's
  * partial-aggregation order can never produce a different last-ulp than
  * DuckDB's sequential sum. Every output is fully deterministically ordered.
  */
object RelationalQueries {

  /** sum over an exact decimal cast, returned as double. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,4)")).cast("double")

  val all: Map[String, Q] = Map(

    // ---- S1: scan + projection + filter (predicate/column pushdown to parquet;
    // reference: getSelectModel coercion, Harvester.java:1547-1585)
    "s1_scan_project" -> Q(
      """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-04-01'
        |ORDER BY l_orderkey, l_partkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1995-04-01").cast("timestamp"))
        .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_partkey", "l_linenumber")
    },

    // ---- S6/U1: multi-source union with set semantics (model.add bag-union +
    // graph set semantics, Harvester.java:1640-1659)
    "s6_union_distinct" -> Q(
      """SELECT k, count(*) AS n FROM (
        |  SELECT o_custkey AS k FROM orders
        |  UNION
        |  SELECT c_custkey AS k FROM customer
        |) GROUP BY k ORDER BY k""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(col("o_custkey").as("k"))
        .unionByName(Tables.customer(s, d).select(col("c_custkey").as("k")))
        .distinct()
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k")
    },

    // ---- P1: predicate white/blacklist (Harvester.java:1811-1824) — broadcast
    // set membership filter
    "p1_predicate_whitelist" -> Q(
      """SELECT event_type, count(*) AS n
        |FROM events WHERE event_type IN ('click','view','purchase')
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val whitelist = Seq("click", "view", "purchase")
      Tables.events(s, d)
        .filter(col("event_type").isInCollection(whitelist))
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // ---- P2: whiteMap/blackMap per-predicate object filters
    // (ESNormalizer.java:203-212): keep a row iff its predicate's white-set
    // admits the value bucket and its black-set doesn't forbid it
    "p2_object_value_maps" -> Q(
      """SELECT event_type, count(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE (event_type <> 'click' OR CAST(FLOOR(value/10) AS BIGINT) IN (0,1,2))
        |  AND (event_type <> 'view'  OR CAST(FLOOR(value/10) AS BIGINT) NOT IN (3))
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val bucket = floor(col("value") / 10).cast("bigint")
      Tables.events(s, d)
        .filter((col("event_type") =!= "click" || bucket.isin(0, 1, 2)) &&
                (col("event_type") =!= "view" || !bucket.isin(3)))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("event_type")
    },

    // ---- P5/F1: parseForJson char-exact cleanup (EEASettings.java:56-63) —
    // the per-turn text-equality invariant, as a codegen'd Column chain
    "p5_text_clean" -> Q(
      """SELECT doc_id,
        |  replace(
        |    regexp_replace(
        |      replace(
        |        replace(
        |          replace(
        |            regexp_replace(
        |              regexp_replace(text, '^[\x00-\x20]+|[\x00-\x20]+$', ''),
        |              '[\n\r]', ' ', 'g'),
        |            '"', ''''),
        |          chr(9), '    '),
        |        chr(92) || '''', ''''),
        |      '\\x[a-fA-F0-9][a-fA-F0-9]', '_', 'g'),
        |    chr(92), chr(92) || chr(92)) AS clean
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextNorm.parseForJsonCol(col("text")).as("clean"))
        .orderBy("doc_id")
    },

    // ---- P6/F2: intended removeIllegalXMLChar (EEASettings.java:65-69;
    // reference discards the result — we implement the intent, documented)
    "p6_xml_strip" -> Q(
      """SELECT doc_id, length(regexp_replace(text, '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g')) AS clean_len
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          length(TextNorm.removeIllegalXmlCharsIntended(col("text"))).as("clean_len"))
        .orderBy("doc_id")
    },

    // ---- J1: label-resolution broadcast join (getLabelForUri,
    // ESNormalizer.java:410-457): URI -> human label, URI kept when no label
    "j1_label_broadcast_join" -> Q(
      """SELECT coalesce(s.s_name, 'urn:supp:' || CAST(l.l_suppkey AS VARCHAR)) AS label,
        |       count(*) AS n, CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
        |FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |GROUP BY 1 ORDER BY label""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val supp = Tables.supplier(s, d)
      li.join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"), "left")
        .select(
          coalesce(col("s_name"), concat(lit("urn:supp:"), col("l_suppkey").cast("string"))).as("label"),
          col("l_quantity"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .orderBy("label")
    },

    // ---- J2: in-model prefLabel resolution as a multi-hop dimension chain
    // (getPrefLbl, ESNormalizer.java:157-166) — customer -> nation -> region
    "j2_dimension_chain_join" -> Q(
      """SELECT r.r_name, n.n_name, count(*) AS n_cust,
        |       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS bal
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name, n.n_name ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val n = broadcast(Tables.nation(s, d))
      val r = broadcast(Tables.region(s, d))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("bal"))
        .orderBy("r_name", "n_name")
    },

    // ---- J3: sync semi-join — restrict work to a changed-key set
    // (getSyncQueryStr FILTER(?s in ...), Harvester.java:963-1034)
    "j3_sync_semijoin" -> Q(
      """SELECT o_orderpriority, count(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val changed = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("o_custkey"))
      Tables.orders(s, d)
        .join(broadcast(changed), Seq("o_custkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("o_orderpriority")
    },

    // ---- J4: delete anti-join — rows whose key vanished from the current set
    // (removeMissingUris, Harvester.java:1045-1162)
    "j4_delete_antijoin" -> Q(
      """SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 75000)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 75000)
            .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    },

    // ---- A1/A2: group-by-subject hash aggregation (Harvester.java:1826-1877;
    // TPC-H Q1 shape) — partial aggregation/map-side combine before shuffle
    "a1_groupby_aggregate" -> Q(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          sum(col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1) - col("l_discount").cast("decimal(18,4)"))).cast("double").as("revenue"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- A2: group-by (subject,predicate) -> deduped value list
    // (ESNormalizer.java:168-222); order-stable via array_sort (SURVEY §7.4.6)
    "a2_collect_values" -> Q(
      """SELECT l_orderkey,
        |       array_to_string(list_sort(list_distinct(list(l_returnflag || l_linestatus))), ',') AS vals
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(array_join(array_sort(collect_set(
          concat(col("l_returnflag"), col("l_linestatus")))), ",").as("vals"))
        .orderBy("l_orderkey")
    },

    // ---- A3: normalizeObj value canonicalization before dedup
    // (ESNormalizer.java:214-222) — broadcast-map rewrite then aggregate
    "a3_normalize_obj" -> Q(
      """SELECT CASE event_type WHEN 'click' THEN 'interaction'
        |                       WHEN 'view' THEN 'interaction'
        |                       WHEN 'purchase' THEN 'commerce'
        |                       ELSE event_type END AS canon,
        |       count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY canon""".stripMargin) { (s, d) =>
      val canon = when(col("event_type").isin("click", "view"), "interaction")
        .when(col("event_type") === "purchase", "commerce")
        .otherwise(col("event_type"))
      Tables.events(s, d)
        .groupBy(canon.as("canon"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .orderBy("canon")
    },

    // ---- A4: normalizeProp rename / 1->N fan-out with collision merge
    // (ESNormalizer.java:228-307) — explode of a rename map
    "a4_prop_rename_fanout" -> Q(
      """SELECT renamed, count(*) AS n FROM (
        |  SELECT unnest(CASE event_type
        |    WHEN 'click'    THEN ['interaction','ui_event']
        |    WHEN 'view'     THEN ['interaction']
        |    WHEN 'purchase' THEN ['commerce','conversion']
        |    WHEN 'signup'   THEN ['conversion']
        |    ELSE ['diagnostic'] END) AS renamed
        |  FROM events)
        |GROUP BY renamed ORDER BY renamed""".stripMargin) { (s, d) =>
      val renames = when(col("event_type") === "click", array(lit("interaction"), lit("ui_event")))
        .when(col("event_type") === "view", array(lit("interaction")))
        .when(col("event_type") === "purchase", array(lit("commerce"), lit("conversion")))
        .when(col("event_type") === "signup", array(lit("conversion")))
        .otherwise(array(lit("diagnostic")))
      Tables.events(s, d)
        .select(explode(renames).as("renamed"))
        .groupBy("renamed").agg(count(lit(1)).as("n"))
        .orderBy("renamed")
    },

    // ---- A5: normalizeMissing default fill (ESNormalizer.java:129-155) —
    // absent properties materialize with defaults (zero-filled pivot)
    "a5_missing_default_fill" -> Q(
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(SUM(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      def cnt(t: String) = sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t")
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(cnt("click"), cnt("view"), cnt("purchase"), cnt("signup"), cnt("error"))
        .orderBy("user_id")
    },

    // ---- A6: language split + shared-prop merge (ESNormalizer.java:114-127,
    // 177-194): per-(subject,lang) doc plus per-subject shared totals merged in
    "a6_language_split_merge" -> Q(
      """SELECT source, lang, count(*) AS n_docs,
        |       CAST(SUM(count(*)) OVER (PARTITION BY source) AS BIGINT) AS shared_total
        |FROM documents GROUP BY source, lang ORDER BY source, lang""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("source")
      Tables.documents(s, d)
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("shared_total", sum(col("n_docs")).over(w))
        .orderBy("source", "lang")
    },

    // ---- A8: distinct changed-key set since watermark
    // (executeSyncQuery, Harvester.java:896-951, 1204-1215)
    "a8_changed_set" -> Q(
      """SELECT DISTINCT user_id FROM events
        |WHERE ts > TIMESTAMP '2024-01-10 00:00:00' ORDER BY user_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .filter(col("ts") > lit("2024-01-10 00:00:00").cast("timestamp"))
        .select("user_id").distinct()
        .orderBy("user_id")
    },

    // ---- A9: per-run metrics accumulation (UpdateRecord,
    // Harvester.java:1894-1904) — observed counts per class
    "a9_run_metrics" -> Q(
      """SELECT event_type, count(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |       min(ts) AS first_ts, max(ts) AS last_ts
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
          min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
        .orderBy("event_type")
    },

    // ---- W1: update-history ranking — latest K per key
    // (River.java:123-129)
    "w1_history_ranking" -> Q(
      """SELECT user_id, event_id, rn FROM (
        |  SELECT user_id, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn <= 10 ORDER BY user_id, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select("user_id", "event_id", "rn")
        .orderBy("user_id", "rn")
    },

    // ---- W2: LIMIT passthrough (SPARQLTest.java:90-95) with deterministic order
    "w2_ordered_limit" -> Q(
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // ---- W3: label-priority first-match-wins — top-1-per-group by ranked
    // source (ESNormalizer.java:417-455): purchase > signup > click > view > error
    "w3_priority_top1" -> Q(
      """SELECT user_id, event_type, event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY
        |      CASE event_type WHEN 'purchase' THEN 1 WHEN 'signup' THEN 2
        |        WHEN 'click' THEN 3 WHEN 'view' THEN 4 ELSE 5 END, ts, event_id) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, d) =>
      val prio = when(col("event_type") === "purchase", 1)
        .when(col("event_type") === "signup", 2)
        .when(col("event_type") === "click", 3)
        .when(col("event_type") === "view", 4).otherwise(5)
      val w = Window.partitionBy("user_id").orderBy(prio, col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_type", "event_id")
        .orderBy("user_id")
    },

    // ---- F7/F8: doc-id construction subj@lang (Harvester.java:1852-1853) +
    // deterministic JSON doc render (mapToString, Harvester.java:1937-1951)
    "f7_doc_id_render" -> Q(
      """SELECT CAST(doc_id AS VARCHAR) || '@' || lang AS id,
        |       '{"n_chars" : [' || CAST(n_chars AS VARCHAR) || '], "source" : ["' || source || '"]}' AS doc
        |FROM documents ORDER BY id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(
          concat_ws("@", col("doc_id").cast("string"), col("lang")).as("id"),
          concat(lit("{\"n_chars\" : ["), col("n_chars").cast("string"),
            lit("], \"source\" : [\""), col("source"), lit("\"]}")).as("doc"))
        .orderBy("id")
    },

    // ---- F10/mm: typed literal passthrough + JSON property extraction
    // (getStringForResult datatype dispatch, ESNormalizer.java:349-393)
    "f10_typed_extract" -> Q(
      """SELECT event_type,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(sum(get_json_object(col("props"), "$.k").cast("bigint")).as("sum_k"))
        .orderBy("event_type")
    },

    // ---- streaming-shape windowed aggregation (batch-equivalent of the
    // Structured Streaming tumbling-window agg; stream variant in
    // graft.streaming tested separately)
    "st_tumbling_window" -> Q(
      """SELECT date_trunc('hour', ts) AS bucket, event_type, count(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("bucket", "event_type")
    },

    // ---- sync: incremental re-extract over the changed-key semi-join
    // (sync(), Harvester.java:1199-1453: changed set -> per-key re-harvest)
    "sync_incremental" -> Q(
      """SELECT e.user_id, count(*) AS n, max(e.ts) AS last_ts
        |FROM events e
        |WHERE e.user_id IN (SELECT DISTINCT user_id FROM events
        |                    WHERE ts > TIMESTAMP '2024-01-20 00:00:00')
        |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val changed = ev.filter(col("ts") > lit("2024-01-20 00:00:00").cast("timestamp"))
        .select("user_id").distinct()
      ev.join(broadcast(changed), Seq("user_id"), "left_semi")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), max(col("ts")).as("last_ts"))
        .orderBy("user_id")
    },

    // ---- F3: timestamp <-> string formatting (yyyy-MM-dd'T'HH:mm:ss, the
    // reference's sync-filter literal format, Harvester.java:1204-1213)
    "f3_date_format" -> Q(
      """SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso,
        |       CAST(date_trunc('day', ts) AS DATE) AS day
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("iso"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .orderBy("event_id")
    },

    // ---- sessionization: gap-based event-time sessions per user (30-min
    // inactivity gap) — lag + cumulative window sum, the batch equivalent of
    // streaming session windows
    "w4_sessionize" -> Q(
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
        |                (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000 OR
        |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |s AS (SELECT user_id, ts, event_id,
        |             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_id
        |      FROM g)
        |SELECT user_id, session_id, count(*) AS n, min(ts) AS t0, max(ts) AS t1
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val g = Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts").cast("timestamp")) -
              unix_micros(col("prev_ts").cast("timestamp")) > 1800000000L, 1L)
            .otherwise(0L))
      g.withColumn("session_id",
          sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n"), min(col("ts")).as("t0"), max(col("ts")).as("t1"))
        .orderBy("user_id", "session_id")
    },

    // ---- sync delete: keys present before the watermark but vanished after
    // (syncOldData + removeMissingUris anti-join, Harvester.java:1245-1258)
    "sync_vanished_keys" -> Q(
      """SELECT user_id FROM events
        |WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-29 00:00:00'
        |EXCEPT
        |SELECT user_id FROM events
        |WHERE event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-29 00:00:00'
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).filter(col("event_type") === "purchase")
      val w = lit("2024-01-29 00:00:00").cast("timestamp")
      ev.filter(col("ts") < w).select("user_id").distinct()
        .join(ev.filter(col("ts") >= w).select("user_id").distinct(),
          Seq("user_id"), "left_anti")
        .orderBy("user_id")
    }
  )
}
