package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Customer-base analytics the reference's commerce domain implies:
  * RFM segmentation and Pareto (ABC) concentration.
  *
  * Scale doctrine for both: NO unpartitioned window ever touches the
  * customer population.
  *  - RFM uses FIXED business breakpoints (the practitioner norm) instead
  *    of data quantiles, so scoring is a pure scan-side projection after
  *    one groupBy — an ntile(5) over all customers would be a
  *    single-task global sort at 10⁸ customers.
  *  - Pareto runs its cumulative window over the TOP-100 frame only
  *    (physicalized as TakeOrderedAndProject, never a global sort); the
  *    in-frame total comes from an unbounded-following window over the
  *    same 100 rows, so the fact aggregate is computed exactly once.
  */
object Commerce {

  type Q = (SparkSession, String) => DataFrame

  // data ends 2001-08-01 — the fixed "as of" anchor makes recency
  // deterministic (a now() would hash differently every run)
  private val RefDate = "2001-08-01"

  // ---- RFM segmentation with fixed breakpoints ----
  def custRfm(s: SparkSession, d: String): DataFrame = {
    val perCust = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(max(col("o_orderdate").cast("date")).as("last_day"),
        count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val days = datediff(lit(RefDate).cast("date"), col("last_day"))
    val r = when(days <= 180, 5L).when(days <= 365, 4L)
      .when(days <= 730, 3L).when(days <= 1095, 2L).otherwise(1L)
    val f = when(col("n_orders") >= 13, 5L).when(col("n_orders") >= 11, 4L)
      .when(col("n_orders") >= 9, 3L).when(col("n_orders") >= 7, 2L).otherwise(1L)
    val m = when(col("cents") >= 325000000L, 5L).when(col("cents") >= 267000000L, 4L)
      .when(col("cents") >= 223000000L, 3L).when(col("cents") >= 171000000L, 2L)
      .otherwise(1L)
    perCust
      .select(r.as("r"), f.as("f"), m.as("m"), col("cents"))
      .groupBy("r", "f", "m")
      .agg(count(lit(1)).as("n_customers"),
        (sum(col("cents")).cast("long") / lit(100.0)).as("revenue"))
      .orderBy("r", "f", "m")
  }

  val custRfmSql: String =
    """WITH c AS (
      |  SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_day,
      |         count(*) AS n_orders,
      |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1
      |), scored AS (
      |  SELECT CASE WHEN date_diff('day', last_day, DATE '2001-08-01') <= 180 THEN 5
      |              WHEN date_diff('day', last_day, DATE '2001-08-01') <= 365 THEN 4
      |              WHEN date_diff('day', last_day, DATE '2001-08-01') <= 730 THEN 3
      |              WHEN date_diff('day', last_day, DATE '2001-08-01') <= 1095 THEN 2
      |              ELSE 1 END AS r,
      |         CASE WHEN n_orders >= 13 THEN 5 WHEN n_orders >= 11 THEN 4
      |              WHEN n_orders >= 9 THEN 3 WHEN n_orders >= 7 THEN 2
      |              ELSE 1 END AS f,
      |         CASE WHEN cents >= 325000000 THEN 5 WHEN cents >= 267000000 THEN 4
      |              WHEN cents >= 223000000 THEN 3 WHEN cents >= 171000000 THEN 2
      |              ELSE 1 END AS m,
      |         cents
      |  FROM c
      |)
      |SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f, CAST(m AS BIGINT) AS m,
      |       CAST(count(*) AS BIGINT) AS n_customers,
      |       CAST(sum(cents) AS BIGINT) / 100.0 AS revenue
      |FROM scored GROUP BY 1, 2, 3 ORDER BY r, f, m""".stripMargin

  // ---- Pareto / ABC: revenue concentration in the top 100 customers ----
  def custPareto(s: SparkSession, d: String): DataFrame = {
    val top = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .orderBy(desc("cents"), col("o_custkey"))
      .limit(100)
    val order = Seq(desc("cents"), col("o_custkey"))
    val wCum = Window.orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    top
      .withColumn("rk", row_number().over(Window.orderBy(order: _*)))
      .withColumn("cum_cents", sum(col("cents")).over(wCum))
      .withColumn("ttl_cents", sum(col("cents")).over(wAll))
      // ABC class on exact integers: A holds the first half of the
      // frame's revenue, B through 80%, C the tail
      .select(col("rk").cast("long").as("rk"), col("o_custkey"),
        (col("cents") / lit(100.0)).as("revenue"),
        (lit(100.0) * col("cum_cents") / col("ttl_cents")).as("cum_pct"),
        when(col("cum_cents") * 10 <= col("ttl_cents") * 5, "A")
          .when(col("cum_cents") * 10 <= col("ttl_cents") * 8, "B")
          .otherwise("C").as("abc"))
      .orderBy("rk")
  }

  val custParetoSql: String =
    """WITH top AS (
      |  SELECT o_custkey,
      |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1
      |  ORDER BY cents DESC, o_custkey LIMIT 100
      |), w AS (
      |  SELECT o_custkey, cents,
      |         row_number() OVER (ORDER BY cents DESC, o_custkey) AS rk,
      |         sum(cents) OVER (ORDER BY cents DESC, o_custkey
      |                          ROWS UNBOUNDED PRECEDING) AS cum_cents,
      |         sum(cents) OVER () AS ttl_cents
      |  FROM top
      |)
      |SELECT CAST(rk AS BIGINT) AS rk, o_custkey, cents / 100.0 AS revenue,
      |       100.0 * CAST(cum_cents AS BIGINT) / CAST(ttl_cents AS BIGINT) AS cum_pct,
      |       CASE WHEN cum_cents * 10 <= ttl_cents * 5 THEN 'A'
      |            WHEN cum_cents * 10 <= ttl_cents * 8 THEN 'B'
      |            ELSE 'C' END AS abc
      |FROM w ORDER BY rk""".stripMargin

  // ---- last-touch marketing attribution ----
  // Which channel gets credit for each purchase: the LATEST non-purchase
  // event by the same user at or before the purchase instant (the
  // classic last-touch model), revenue rolled up per channel, unmatched
  // purchases credited to 'direct'. Composes the one-shuffle union-window
  // as-of operator (operators/AsOf — no per-purchase scan of the user's
  // history, no join amplification); touches pre-aggregate to one row
  // per (user, instant) because the as-of contract — like DuckDB's ASOF —
  // needs a unique right side at each timestamp (max(event_type) is the
  // deterministic tie-break both engines replay). Money in exact cents.
  def evAttribution(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev
      .filter(col("event_type") === "purchase"
        && col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
    val touches = ev
      .filter(col("event_type") =!= "purchase"
        && col("user_id").isNotNull && col("ts").isNotNull)
      .groupBy(col("user_id"), col("ts").as("touch_ts"))
      .agg(max("event_type").as("channel"))
    graft.operators.AsOf.joinAsOf(purchases, touches,
        "user_id", "ts", "touch_ts", Seq("channel"))
      .groupBy(coalesce(col("channel"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        (sum(col("cents")).cast("long") / lit(100.0)).as("revenue"))
      .orderBy("channel")
  }

  val evAttributionSql: String =
    """WITH p AS (
      |  SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events
      |  WHERE event_type = 'purchase' AND user_id IS NOT NULL AND ts IS NOT NULL
      |), t AS (
      |  SELECT user_id, ts AS touch_ts, max(event_type) AS channel
      |  FROM events
      |  WHERE event_type <> 'purchase' AND user_id IS NOT NULL AND ts IS NOT NULL
      |  GROUP BY 1, 2
      |)
      |SELECT COALESCE(t.channel, 'direct') AS channel,
      |       CAST(count(*) AS BIGINT) AS n_purchases,
      |       CAST(sum(p.cents) AS BIGINT) / 100.0 AS revenue
      |FROM p ASOF LEFT JOIN t
      |  ON p.user_id = t.user_id AND t.touch_ts <= p.ts
      |GROUP BY 1 ORDER BY channel""".stripMargin

  val queries: Map[String, Q] = Map(
    "cust_rfm" -> (custRfm _),
    "cust_pareto" -> (custPareto _),
    "ev_attribution" -> (evAttribution _))

  val oracles: Map[String, String] = Map(
    "cust_rfm" -> custRfmSql,
    "cust_pareto" -> custParetoSql,
    "ev_attribution" -> evAttributionSql)
}
