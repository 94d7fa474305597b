package graft.queries

import graft.Tables
import graft.normalize.Drift
import graft.operators.{DailyRevenue, Dedup, Dimensions, Quality}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY §2.1–§2.8) as named queries over
  * the driver testdata, each with DuckDB oracle SQL.
  *
  * Determinism rules shared by Spark + oracle: explicit total ORDER BY,
  * aggregates rounded where float summation order could differ, integer
  * aggregates cast to BIGINT (DuckDB sums integers into HUGEINT).
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  // ---- flagship: fact_order_daily over orders/lineitem (A1, §4.2) ----
  def a1FactOrderDaily(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    // payments and refunds both derive from lineitem -> single-pass form:
    // one scan + one attribution join (bit-identical to the two-frame form)
    DailyRevenue.dailyAggregateFromItems(
      orders = o, orderId = "o_orderkey",
      orderDate = col("o_orderdate").cast("date"), dim = col("o_orderpriority"),
      items = l, itemOrderId = "l_orderkey",
      payAmount = col("l_extendedprice"),
      payStatus = when(col("l_returnflag") === "N", lit("success")).otherwise(lit("failed")),
      refundFlag = col("l_returnflag") === "R",
      refundAmount = col("l_extendedprice") * col("l_discount")
    ).orderBy("order_date", "vendor")
  }

  val a1FactOrderDailySql: String =
    """WITH order_key AS (
      |  SELECT o_orderkey AS order_id, CAST(o_orderdate AS DATE) AS order_date,
      |         o_orderpriority AS vendor
      |  FROM orders WHERE o_orderdate IS NOT NULL
      |), pay_agg AS (
      |  SELECT k.order_date, k.vendor,
      |         CAST(sum(CAST(round(l.l_extendedprice * 10000) AS BIGINT)) AS BIGINT)
      |           / 10000.0 AS gross_revenue,
      |         CAST(sum(CASE WHEN l.l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS paid_count
      |  FROM lineitem l JOIN order_key k ON l.l_orderkey = k.order_id
      |  GROUP BY 1, 2
      |), ref_agg AS (
      |  SELECT k.order_date, k.vendor,
      |         CAST(sum(CAST(round(l.l_extendedprice * l.l_discount * 10000) AS BIGINT)) AS BIGINT)
      |           / 10000.0 AS total_refunds
      |  FROM lineitem l JOIN order_key k ON l.l_orderkey = k.order_id
      |  WHERE l.l_returnflag = 'R'
      |  GROUP BY 1, 2
      |), base AS (
      |  SELECT order_date, vendor, CAST(count(*) AS BIGINT) AS order_count
      |  FROM order_key GROUP BY 1, 2
      |), j AS (
      |  SELECT b.order_date, b.vendor,
      |         coalesce(p.gross_revenue, 0) AS gross_revenue,
      |         coalesce(r.total_refunds, 0) AS total_refunds,
      |         b.order_count, coalesce(p.paid_count, 0) AS paid_count
      |  FROM base b
      |  LEFT JOIN pay_agg p USING (order_date, vendor)
      |  LEFT JOIN ref_agg r USING (order_date, vendor)
      |)
      |SELECT order_date, vendor, gross_revenue, total_refunds,
      |       gross_revenue - total_refunds AS net_revenue,
      |       order_count, paid_count,
      |       CASE WHEN order_count > 0
      |            THEN round(paid_count / CAST(order_count AS DOUBLE), 4) END
      |         AS payment_success_rate,
      |       CASE WHEN gross_revenue > 0
      |            THEN round(total_refunds / gross_revenue, 4) END AS refund_rate
      |FROM j ORDER BY order_date, vendor""".stripMargin

  // ---- events daily aggregate (A1 analogue on the envelope table) ----
  def evDailyAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("ts").cast("date").as("event_date"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum("value"), 2).as("sum_value"),
        round(avg(get_json_object(col("props"), "$.k").cast("double")), 4).as("avg_k"))
      .orderBy("event_date", "event_type")

  val evDailyAggSql: String =
    """SELECT CAST(ts AS DATE) AS event_date, event_type,
      |       CAST(count(*) AS BIGINT) AS n,
      |       round(sum(value), 2) AS sum_value,
      |       round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k
      |FROM events GROUP BY 1, 2 ORDER BY event_date, event_type""".stripMargin

  // ---- S4: scan with predicate pushdown + projection pruning ----
  def s4ScanPushdown(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "signup") && col("value") > 100)
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy("event_id")

  val s4ScanPushdownSql: String =
    """SELECT event_id, event_type, value FROM events
      |WHERE event_type IN ('purchase', 'signup') AND value > 100
      |ORDER BY event_id""".stripMargin

  // ---- P3/P4: nested-field extraction + drift key fallback ----
  def p4DriftCoalesce(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_type"),
        Drift.jsonCoalesce(col("props"), Seq("missing_key", "renamed_key", "k"))
          .cast("long").as("k"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count(lit(1)).as("n"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("null_k"))
      .orderBy("event_type")

  val p4DriftCoalesceSql: String =
    """SELECT event_type,
      |       CAST(sum(k) AS BIGINT) AS sum_k,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_k
      |FROM (
      |  SELECT event_type,
      |         CAST(coalesce(json_extract_string(props, '$.missing_key'),
      |                       json_extract_string(props, '$.renamed_key'),
      |                       json_extract_string(props, '$.k')) AS BIGINT) AS k
      |  FROM events
      |) GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- P5: status normalization ----
  def p5StatusNormalize(s: SparkSession, d: String): DataFrame = {
    val raw = when(col("event_type") === "purchase", lit("PAID "))
      .when(col("event_type") === "error", lit("Fail"))
      .when(col("event_type") === "click", lit("Completed"))
      .otherwise(col("event_type"))
    Tables.events(s, d)
      .select(Drift.normalizeStatus(raw).as("status"))
      .groupBy("status").agg(count(lit(1)).as("n"))
      .orderBy("status")
  }

  val p5StatusNormalizeSql: String =
    """SELECT status, CAST(count(*) AS BIGINT) AS n FROM (
      |  SELECT CASE
      |           WHEN lc IN ('failed', 'fail', 'error') THEN 'failed'
      |           WHEN lc IN ('success', 'successful', 'completed', 'paid') THEN 'success'
      |           ELSE lc END AS status
      |  FROM (
      |    SELECT lower(trim(CASE WHEN event_type = 'purchase' THEN 'PAID '
      |                           WHEN event_type = 'error' THEN 'Fail'
      |                           WHEN event_type = 'click' THEN 'Completed'
      |                           ELSE event_type END)) AS lc
      |    FROM events)
      |) GROUP BY status ORDER BY status""".stripMargin

  // ---- P7: lenient multi-format timestamp parsing ----
  def p7TsMultiformat(s: SparkSession, d: String): DataFrame = {
    // 5-format parse cascade per row: spread narrow local scans
    val ev = graft.Par.spread(Tables.events(s, d))
    val raw = when(col("user_id") % 4 === 0, date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"))
      .when(col("user_id") % 4 === 1, date_format(col("ts"), "yyyy-MM-dd HH:mm"))
      .when(col("user_id") % 4 === 2, date_format(col("ts"), "yyyy/MM/dd HH:mm:ss"))
      .otherwise(unix_timestamp(col("ts")).cast("string"))
    ev.select(Drift.parseTimestampMulti(raw).as("parsed"))
      .groupBy(col("parsed").cast("date").as("parsed_date"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("parsed").isNull, 1L).otherwise(0L)).as("unparsed"))
      .orderBy("parsed_date")
  }

  val p7TsMultiformatSql: String =
    """WITH raw AS (
      |  SELECT CASE
      |    WHEN user_id % 4 = 0 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S')
      |    WHEN user_id % 4 = 1 THEN strftime(ts, '%Y-%m-%d %H:%M')
      |    WHEN user_id % 4 = 2 THEN strftime(ts, '%Y/%m/%d %H:%M:%S')
      |    ELSE CAST(CAST(floor(epoch(ts)) AS BIGINT) AS VARCHAR) END AS r
      |  FROM events
      |), parsed AS (
      |  SELECT coalesce(
      |    try_strptime(trim(r), '%Y-%m-%dT%H:%M:%S'),
      |    try_strptime(trim(r), '%Y-%m-%d %H:%M'),
      |    try_strptime(trim(r), '%Y/%m/%d %H:%M:%S'),
      |    CASE WHEN regexp_matches(trim(r), '^[0-9]{10,11}$')
      |         THEN to_timestamp(CAST(trim(r) AS BIGINT)) END) AS parsed
      |  FROM raw
      |)
      |SELECT CAST(parsed AS DATE) AS parsed_date, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CASE WHEN parsed IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unparsed
      |FROM parsed GROUP BY 1 ORDER BY parsed_date""".stripMargin

  // ---- P12: deterministic hash ids ----
  def p12HashIds(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        Drift.sha256Id("order", col("o_orderkey")).as("sha_id"),
        Drift.md5Id(Seq(col("o_orderkey"), col("o_orderstatus"))).as("md5_id"))
      .orderBy("o_orderkey")

  val p12HashIdsSql: String =
    """SELECT o_orderkey,
      |       sha256('order:' || CAST(o_orderkey AS VARCHAR)) AS sha_id,
      |       md5(CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus) AS md5_id
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---- P14: arithmetic with zero-guards ----
  def p14RatioGuard(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_orderstatus")
      .agg(
        round(sum("o_totalprice"), 2).as("total_price"),
        count(lit(1)).as("n_orders"),
        round(avg("o_totalprice"), 4).as("avg_price"))
      .withColumn("share_per_order",
        when(col("n_orders") > 0, round(col("total_price") / col("n_orders"), 4)))
      .orderBy("o_orderstatus")

  val p14RatioGuardSql: String =
    """SELECT o_orderstatus,
      |       round(sum(o_totalprice), 2) AS total_price,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       round(avg(o_totalprice), 4) AS avg_price,
      |       CASE WHEN count(*) > 0
      |            THEN round(round(sum(o_totalprice), 2) / count(*), 4) END
      |         AS share_per_order
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---- P15: day deltas after an inner join ----
  def p15DayDelta(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(col("l_returnflag"),
        datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("delta_days"))
      .groupBy("l_returnflag")
      .agg(
        round(avg("delta_days"), 4).as("avg_delay"),
        sum(when(col("delta_days") > 90, 1L).otherwise(0L)).as("over_90"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  val p15DayDeltaSql: String =
    """SELECT l_returnflag,
      |       round(avg(delta_days), 4) AS avg_delay,
      |       CAST(sum(CASE WHEN delta_days > 90 THEN 1 ELSE 0 END) AS BIGINT) AS over_90,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM (
      |  SELECT l.l_returnflag,
      |         datediff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) AS delta_days
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |) GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- D1: latest-wins dedup ----
  def d1LatestWins(s: SparkSession, d: String): DataFrame =
    Dedup.latestWins(Tables.events(s, d), Seq("user_id"),
        Seq(col("ts").desc_nulls_last, col("event_id").desc))
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy("user_id")

  val d1LatestWinsSql: String =
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events
      |) WHERE rn = 1 ORDER BY user_id""".stripMargin

  // ---- D2: first-wins dedup ----
  // asc_nulls_LAST: DuckDB's default null order is NULLS LAST for ASC
  // (Spark's is nulls first), and the Dedup contract says null
  // timestamps lose to any non-null — d1's desc_nulls_last is the same
  // decision from the other direction
  def d2FirstWins(s: SparkSession, d: String): DataFrame =
    Dedup.firstWins(Tables.events(s, d), Seq("user_id", "event_type"),
        Seq(col("ts").asc_nulls_last, col("event_id").asc))
      .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
      .orderBy("user_id", "event_type")

  val d2FirstWinsSql: String =
    """SELECT user_id, event_type, event_id, value FROM (
      |  SELECT user_id, event_type, event_id, value,
      |         row_number() OVER (PARTITION BY user_id, event_type
      |                            ORDER BY ts ASC, event_id ASC) AS rn
      |  FROM events
      |) WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  // ---- D3 + O4: union replay then idempotent ingest dedup ----
  def d3IngestDedup(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val doubled = ev.unionByName(ev) // simulated replay of the whole feed
    Dedup.ingestDedup(doubled, "event_id", "ts")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("event_type")
  }

  val d3IngestDedupSql: String =
    """WITH doubled AS (
      |  SELECT * FROM events UNION ALL SELECT * FROM events
      |), deduped AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY ts DESC) AS rn
      |    FROM doubled
      |  ) WHERE rn = 1
      |)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |       round(sum(value), 2) AS sum_value
      |FROM deduped GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- J1: left-semi join ----
  def j1Semi(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val bigOrders = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
    c.join(bigOrders, c("c_custkey") === bigOrders("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  val j1SemiSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  // ---- J2: left-anti join (orphans) ----
  def j2Anti(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("customers_without_orders"))
      .orderBy("c_mktsegment")
  }

  val j2AntiSql: String =
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS customers_without_orders
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---- J3: inner equi-join + aggregate ----
  def j3InnerAgg(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue"),
        round(avg("c_acctbal"), 4).as("avg_acctbal"))
      .orderBy("c_mktsegment")
  }

  val j3InnerAggSql: String =
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
      |       round(sum(o_totalprice), 2) AS revenue,
      |       round(avg(c_acctbal), 4) AS avg_acctbal
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---- J4: star-schema broadcast dim joins ----
  def j4StarBroadcast(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_customers"), round(avg("c_acctbal"), 4).as("avg_acctbal"))
      .orderBy("r_name", "n_name")
  }

  val j4StarBroadcastSql: String =
    """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_customers,
      |       round(avg(c_acctbal), 4) AS avg_acctbal
      |FROM customer c
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  // ---- A2: global scalar aggregates ----
  def a2GlobalScalars(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).agg(
      count(lit(1)).as("n_orders"),
      countDistinct("o_custkey").as("n_customers"),
      round(sum("o_totalprice"), 2).as("total_revenue"),
      round(avg("o_totalprice"), 4).as("avg_price"),
      min(col("o_orderdate").cast("date")).as("min_date"),
      max(col("o_orderdate").cast("date")).as("max_date"))

  val a2GlobalScalarsSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
      |       round(sum(o_totalprice), 2) AS total_revenue,
      |       round(avg(o_totalprice), 4) AS avg_price,
      |       min(CAST(o_orderdate AS DATE)) AS min_date,
      |       max(CAST(o_orderdate AS DATE)) AS max_date
      |FROM orders""".stripMargin

  // ---- A3: frequency counts with percentage ----
  def a3ValueCounts(s: SparkSession, d: String): DataFrame =
    Quality.valueCounts(Tables.events(s, d), "event_type")

  val a3ValueCountsSql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS count,
      |       round(count(*) * 100.0 / (SELECT count(*) FROM events), 4) AS pct
      |FROM events GROUP BY event_type
      |ORDER BY count DESC, event_type""".stripMargin

  // ---- A4/A5: grouped min (first-seen) over distinct keys ----
  def a4FirstSeen(s: SparkSession, d: String): DataFrame =
    Dimensions.firstSeen(Tables.events(s, d), "user_id", "ts")
      .select(col("user_id"), col("first_seen").cast("date").as("first_date"))
      .orderBy("user_id")

  val a4FirstSeenSql: String =
    """SELECT user_id, CAST(min(ts) AS DATE) AS first_date
      |FROM events WHERE user_id IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---- O2: top-k by aggregate ----
  def o2TopK(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(desc("revenue"), col("o_custkey"))
      .limit(10)

  val o2TopKSql: String =
    """SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue,
      |       CAST(count(*) AS BIGINT) AS n_orders
      |FROM orders GROUP BY o_custkey
      |ORDER BY revenue DESC, o_custkey LIMIT 10""".stripMargin

  // ---- O5: date-dimension spine ----
  def o5DateSpine(s: SparkSession, d: String): DataFrame =
    Dimensions.dateSpine(s, "2023-01-01", "2026-12-31").orderBy("date_key")

  val o5DateSpineSql: String =
    """SELECT CAST(range AS DATE) AS date_key,
      |       dayname(CAST(range AS DATE)) AS day_of_week,
      |       CAST(weekofyear(CAST(range AS DATE)) AS BIGINT) AS week_number,
      |       CAST(month(CAST(range AS DATE)) AS BIGINT) AS month,
      |       CAST(quarter(CAST(range AS DATE)) AS BIGINT) AS quarter,
      |       CAST(year(CAST(range AS DATE)) AS BIGINT) AS year,
      |       isodow(CAST(range AS DATE)) IN (6, 7) AS is_weekend
      |FROM range(DATE '2023-01-01', DATE '2027-01-01', INTERVAL 1 DAY)
      |ORDER BY date_key""".stripMargin

  // ---- QR: completeness profile (null/zero counts) ----
  def qrCompleteness(s: SparkSession, d: String): DataFrame =
    Quality.completeness(Tables.events(s, d),
      nullCols = Seq("props", "value", "user_id"), zeroCols = Seq("value"))

  val qrCompletenessSql: String =
    """SELECT CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS props_nulls,
      |       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_nulls,
      |       CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS user_id_nulls,
      |       CAST(sum(CASE WHEN value = 0 THEN 1 ELSE 0 END) AS BIGINT) AS value_zeros
      |FROM events""".stripMargin

  // ---- QR: one-row integrity report (counts + orphans + coverage) ----
  // Fused single-pass formulation: round 1 ran 5 independent jobs that
  // scanned orders 3× and lineitem 3×. Here lineitem pre-aggregates to
  // order grain (partial map-side combine), orders carry a customer-orphan
  // flag from one left join, and a single full-outer join at order grain
  // feeds every metric — each table is scanned exactly once.
  def qrReport(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    val c = Tables.customer(s, d)
    val lagg = l.groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_items"))
    val oc = o.select(col("o_orderkey"), col("o_custkey"))
      .join(c.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left")
      .select(col("o_orderkey"), col("c_custkey").isNull.as("orph_ord"))
    oc.join(lagg, col("o_orderkey") === col("l_orderkey"), "full_outer")
      .agg(
        count(col("o_orderkey")).as("total_orders"),
        coalesce(sum(col("n_items")), lit(0L)).as("total_lineitems"),
        coalesce(sum(when(col("o_orderkey").isNull, col("n_items"))), lit(0L))
          .as("orphan_lineitems"),
        coalesce(sum(when(col("orph_ord"), lit(1L))), lit(0L)).as("orphan_orders"),
        count(when(col("o_orderkey").isNotNull && col("l_orderkey").isNull, lit(1)))
          .as("orders_without_lineitems"))
      .withColumn("avg_items_per_order",
        round(col("total_lineitems") / col("total_orders").cast("double"), 4))
  }

  val qrReportSql: String =
    """SELECT
      |  (SELECT CAST(count(*) AS BIGINT) FROM orders) AS total_orders,
      |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS total_lineitems,
      |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
      |    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      |    AS orphan_lineitems,
      |  (SELECT CAST(count(*) AS BIGINT) FROM orders o
      |    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |    AS orphan_orders,
      |  (SELECT CAST(count(*) AS BIGINT) FROM orders o
      |    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey))
      |    AS orders_without_lineitems,
      |  round((SELECT count(*) FROM lineitem) /
      |        CAST((SELECT count(*) FROM orders) AS DOUBLE), 4)
      |    AS avg_items_per_order""".stripMargin

  // ---- QR: order-independent table checksums (migration validation) ----
  // The fingerprint this whole library exists for: "did the port produce
  // EXACTLY the same warehouse?" answered with one number per table. Each
  // row folds to a 48-bit slice of its md5 over a CANONICAL rendering
  // (integers as digits, money as rounded cents, timestamps as epoch
  // micros, NULL as an explicit \0 sentinel — every cast chosen because
  // both engines render it identically; raw double→string formatting
  // does NOT agree across engines and never appears). The table checksum
  // is the SUM of row fingerprints — commutative, so it is partition-,
  // order-, and engine-independent, and any single changed/missing/extra
  // row changes it. Sum lives in decimal(38): 2^48 per row overflows
  // BIGINT at ~32k rows but fits 38 digits to ~10²⁶ rows.
  //
  // Scale shape: embarrassingly parallel — one scan per table, a 48-bit
  // long per row into a partial sum; no shuffle at all beyond the final
  // single-row partials merge. This is the cheapest possible full-table
  // read, which is the point: you run it after every migration batch.
  def qrChecksum(s: SparkSession, d: String): DataFrame = {
    def nn(c: Column) = coalesce(c.cast("string"), lit("\u0000"))
    def money(c: Column) = round(c * 100).cast("long")
    def fp(parts: Seq[Column]): Column =
      conv(substring(md5(concat_ws("|", parts.map(nn): _*)), 1, 12), 16, 10)
        .cast("long")
    def row(table: String, df: DataFrame, parts: Seq[Column]): DataFrame =
      df.select(fp(parts).as("h"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("h").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .cast("string").as("checksum"))
        .select(lit(table).as("tbl"), col("n_rows"), col("checksum"))

    // ALL ten tables — a migration signs off on the whole warehouse,
    // not a sample of it. Free doubles (events.value) and float arrays
    // (embeddings.embedding) render as µ-scaled integers via FLOOR
    // (floor(x·10⁶) is pure IEEE arithmetic, identical in any engine,
    // where a raw double→string rendering and even round() midpoint
    // behavior are NOT portable — the emb_quantize move). The
    // quantization is part of the fingerprint DEFINITION: two
    // warehouses match iff every value agrees to 10⁻⁶, which is
    // float32-exact for embeddings and beyond the money-grade precision
    // events carry.
    def q6(c: Column) = floor(c * 1000000L)
    row("customer", Tables.customer(s, d), Seq(col("c_custkey"), col("c_name"),
        col("c_nationkey"), money(col("c_acctbal")), col("c_mktsegment")))
      .unionByName(row("lineitem", Tables.lineitem(s, d), Seq(col("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        money(col("l_quantity")), money(col("l_extendedprice")),
        money(col("l_discount")), money(col("l_tax")), col("l_returnflag"),
        col("l_linestatus"), unix_micros(col("l_shipdate").cast("timestamp")))))
      .unionByName(row("documents", Tables.documents(s, d),
        Seq(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))))
      .unionByName(row("embeddings", Tables.embeddings(s, d),
        Seq(col("vec_id"),
          concat_ws(",", transform(col("embedding"),
            x => q6(x.cast("double")).cast("string"))),
          col("label"))))
      .unionByName(row("events", Tables.events(s, d),
        Seq(col("event_id"), unix_micros(col("ts")), col("user_id"),
          col("event_type"), q6(col("value")), col("props"))))
      .unionByName(row("nation", Tables.nation(s, d),
        Seq(col("n_nationkey"), col("n_name"), col("n_regionkey"))))
      .unionByName(row("orders", Tables.orders(s, d), Seq(col("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"), money(col("o_totalprice")),
        unix_micros(col("o_orderdate").cast("timestamp")), col("o_orderpriority"))))
      .unionByName(row("part", Tables.part(s, d), Seq(col("p_partkey"),
        col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
        money(col("p_retailprice")))))
      .unionByName(row("region", Tables.region(s, d),
        Seq(col("r_regionkey"), col("r_name"))))
      .unionByName(row("supplier", Tables.supplier(s, d), Seq(col("s_suppkey"),
        col("s_name"), col("s_nationkey"), money(col("s_acctbal")))))
      .orderBy("tbl")
  }

  val qrChecksumSql: String = {
    // the same 48-bit md5-prefix parse as the sk_kmv oracle, spelled
    // long-hand for engine-version portability (r6: no list lambdas, no
    // list_sum, no `<<` — see the note on Approx.skKmvSql); the md5 is
    // computed once per row in a subquery, the 12 terms parse its prefix
    val parse12 = (1 to 12).map { j =>
      val w = 1L << (4 * (12 - j))
      s"(strpos('0123456789abcdef', substr(h, $j, 1)) - 1) * CAST($w AS BIGINT)"
    }.mkString("(", "\n         + ", ")")
    def nn(e: String) = s"COALESCE(CAST($e AS VARCHAR), chr(0))"
    def money(e: String) = s"CAST(round($e * 100) AS BIGINT)"
    def canon(parts: Seq[String]): String =
      parts.map(nn).mkString("concat_ws('|', ", ", ", ")")
    def tbl(name: String, parts: Seq[String]): String =
      s"""SELECT '$name' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
         |       CAST(sum(CAST($parse12 AS HUGEINT)) AS VARCHAR) AS checksum
         |FROM (SELECT md5(${canon(parts)}) AS h FROM $name)""".stripMargin
    Seq(
      tbl("customer", Seq("c_custkey", "c_name", "c_nationkey",
        money("c_acctbal"), "c_mktsegment")),
      tbl("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", money("l_quantity"), money("l_extendedprice"),
        money("l_discount"), money("l_tax"), "l_returnflag", "l_linestatus",
        "epoch_us(l_shipdate)")),
      tbl("documents", Seq("doc_id", "text", "lang", "source", "n_chars")),
      // µ-scaled FLOOR quantization for the free floats — see the query's
      // comment: floor(x·10⁶) is engine-portable where round() is not
      tbl("embeddings", Seq("vec_id",
        "array_to_string(list_transform(embedding, " +
          "x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)), ',')",
        "label")),
      tbl("events", Seq("event_id", "epoch_us(ts)", "user_id", "event_type",
        "CAST(floor(\"value\" * 1000000) AS BIGINT)", "props")),
      tbl("nation", Seq("n_nationkey", "n_name", "n_regionkey")),
      tbl("orders", Seq("o_orderkey", "o_custkey", "o_orderstatus",
        money("o_totalprice"), "epoch_us(o_orderdate)", "o_orderpriority")),
      tbl("part", Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        money("p_retailprice"))),
      tbl("region", Seq("r_regionkey", "r_name")),
      tbl("supplier", Seq("s_suppkey", "s_name", "s_nationkey",
        money("s_acctbal")))
    ).mkString("", "\nUNION ALL\n", "\nORDER BY tbl")
  }

  /** All relational queries. */
  val queries: Map[String, Q] = Map(
    "a1_fact_order_daily" -> (a1FactOrderDaily _),
    "ev_daily_agg" -> (evDailyAgg _),
    "s4_scan_pushdown" -> (s4ScanPushdown _),
    "p4_drift_coalesce" -> (p4DriftCoalesce _),
    "p5_status_normalize" -> (p5StatusNormalize _),
    "p7_ts_multiformat" -> (p7TsMultiformat _),
    "p12_hash_ids" -> (p12HashIds _),
    "p14_ratio_guard" -> (p14RatioGuard _),
    "p15_day_delta" -> (p15DayDelta _),
    "d1_latest_wins" -> (d1LatestWins _),
    "d2_first_wins" -> (d2FirstWins _),
    "d3_ingest_dedup" -> (d3IngestDedup _),
    "j1_semi" -> (j1Semi _),
    "j2_anti" -> (j2Anti _),
    "j3_inner_agg" -> (j3InnerAgg _),
    "j4_star_broadcast" -> (j4StarBroadcast _),
    "a2_global_scalars" -> (a2GlobalScalars _),
    "a3_value_counts" -> (a3ValueCounts _),
    "a4_first_seen" -> (a4FirstSeen _),
    "o2_topk" -> (o2TopK _),
    "o5_date_spine" -> (o5DateSpine _),
    "qr_completeness" -> (qrCompleteness _),
    "qr_report" -> (qrReport _),
    "qr_checksum" -> (qrChecksum _)
  )

  val oracles: Map[String, String] = Map(
    "a1_fact_order_daily" -> a1FactOrderDailySql,
    "ev_daily_agg" -> evDailyAggSql,
    "s4_scan_pushdown" -> s4ScanPushdownSql,
    "p4_drift_coalesce" -> p4DriftCoalesceSql,
    "p5_status_normalize" -> p5StatusNormalizeSql,
    "p7_ts_multiformat" -> p7TsMultiformatSql,
    "p12_hash_ids" -> p12HashIdsSql,
    "p14_ratio_guard" -> p14RatioGuardSql,
    "p15_day_delta" -> p15DayDeltaSql,
    "d1_latest_wins" -> d1LatestWinsSql,
    "d2_first_wins" -> d2FirstWinsSql,
    "d3_ingest_dedup" -> d3IngestDedupSql,
    "j1_semi" -> j1SemiSql,
    "j2_anti" -> j2AntiSql,
    "j3_inner_agg" -> j3InnerAggSql,
    "j4_star_broadcast" -> j4StarBroadcastSql,
    "a2_global_scalars" -> a2GlobalScalarsSql,
    "a3_value_counts" -> a3ValueCountsSql,
    "a4_first_seen" -> a4FirstSeenSql,
    "o2_topk" -> o2TopKSql,
    "o5_date_spine" -> o5DateSpineSql,
    "qr_completeness" -> qrCompletenessSql,
    "qr_report" -> qrReportSql,
    "qr_checksum" -> qrChecksumSql
  )
}
