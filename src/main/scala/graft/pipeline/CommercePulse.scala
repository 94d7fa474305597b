package graft.pipeline

import graft.normalize.Drift
import graft.operators.{DailyRevenue, Dedup, Dimensions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end pipeline with the reference's dataflow semantics
  * (reference `src/bootstrap_loader.py`, `src/live_event_loader.py`,
  * `src/transformer.py`, `src/populate_dimensions.py`,
  * `src/quality_report.py`), re-architected as lazy DataFrame DAGs.
  *
  * The raw-event envelope keeps `payload` as a JSON string (schema-drift
  * tolerant — SURVEY §1.4); every normalization is a `get_json_object`
  * coalesce chain, so the whole normalize layer is projection-only and
  * scales as a map-side pass. The Mongo upsert store is replaced by
  * window dedup on `event_id` (SURVEY §2.3).
  */
object CommercePulse {

  /** Envelope schema (reference `src/bootstrap_loader.py:63-73`). */
  val EnvelopeSchema: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("event_type", StringType),
    StructField("event_time", StringType),
    StructField("vendor", StringType),
    StructField("payload", StringType),
    StructField("ingested_at", StringType),
    StructField("source", StringType)))

  // Event-type → entity mapping covering BOTH naming families — the
  // reference's transformer misses the live names (quirk SURVEY §2.10.1).
  val OrderTypes: Seq[String] =
    Seq("historical_order", "order_created", "order_updated")
  val PaymentTypes: Seq[String] =
    Seq("historical_payment", "payment_attempt", "payment_confirmed", "payment_succeeded")
  val RefundTypes: Seq[String] =
    Seq("historical_refund", "refund_created", "refund_processed", "refund_issued")

  /** S1: historical whole-file JSON array export → envelope rows.
    * `multiLine` handles the array form; missing envelope fields default.
    */
  def readHistorical(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", true).schema(EnvelopeSchema).json(path)
      .withColumn("vendor", coalesce(col("vendor"), lit("unknown")))
      .withColumn("source", coalesce(col("source"), lit("historical_bootstrap")))
      .filter(col("event_id").isNotNull)

  /** S2: daily JSONL with corrupt-line and missing-id skip
    * (reference `src/live_event_loader.py:32-46`). PERMISSIVE mode nulls
    * out corrupt lines; the `event_id IS NOT NULL` filter drops both.
    */
  def readLive(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(EnvelopeSchema).json(path)
      .withColumn("source", coalesce(col("source"), lit("live_stream")))
      .filter(col("event_id").isNotNull)

  /** Count of unparseable lines in a JSONL feed (the reference logs a
    * skip per corrupt line, `src/live_event_loader.py:36-41`): lines that
    * fail JSON parsing entirely or carry no event_id.
    */
  def corruptLineCount(spark: SparkSession, path: String): Long = {
    val parsed = spark.read
      .schema(EnvelopeSchema.add("_corrupt_record", "string"))
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
    parsed.filter(col("_corrupt_record").isNotNull || col("event_id").isNull).count()
  }

  /** O4 + D3: unify feeds and collapse duplicates/replays idempotently —
    * the upsert-by-event_id store (reference `src/live_event_loader.py:51-64`).
    */
  def ingest(feeds: Seq[DataFrame]): DataFrame = {
    val all = feeds.reduce(_.unionByName(_, allowMissingColumns = true))
    Dedup.ingestDedup(all, "event_id", "ingested_at",
      tiebreak = Seq(col("event_time").desc_nulls_last))
  }

  private def pick(paths: String*): org.apache.spark.sql.Column =
    Drift.jsonCoalesce(col("payload"), paths)

  /** Orders normalization WITHOUT the latest-wins collapse — one row per
    * order event version (reference `src/transformer.py:20-41` + live
    * dialects from `src/live_event_generator.py:38-163`). The incremental
    * refresher reads this to find every (date, vendor) grain an order has
    * ever occupied.
    */
  def normalizeOrdersAll(events: DataFrame): DataFrame =
    events.filter(col("event_type").isin(OrderTypes: _*))
      .select(
        // "order.id" before "order": vendor_c nests the id under order_created
        // but sends a plain "order": "ORD-…" scalar on updates/payments
        pick("order_id", "orderRef", "order.id", "orderId", "order").as("order_id"),
        pick("customer_id", "customerId", "customer.email", "buyer.email",
          "buyerEmail", "email").as("customer_id"),
        col("vendor"),
        Drift.toDoubleOrZero(pick("total", "totalAmount", "amount", "order_amount"))
          .as("order_amount"),
        lower(pick("state", "status", "order_status")).as("order_status"),
        Drift.parseTimestampMulti(
          coalesce(pick("created_at", "created", "order.ts"), col("event_time")))
          .as("created_at"),
        col("event_id"))
      .filter(col("order_id").isNotNull)

  /** Orders normalization: D1 latest-wins current state per order. */
  def normalizeOrders(events: DataFrame): DataFrame =
    Dedup.latestWins(normalizeOrdersAll(events), Seq("order_id"),
      Seq(col("created_at").desc_nulls_last, col("event_id").desc))

  /** Payments normalization (reference `src/transformer.py:44-89`). */
  def normalizePayments(events: DataFrame): DataFrame = {
    val base = events.filter(col("event_type").isin(PaymentTypes: _*))
      .select(
        pick("transaction_id", "payment_id", "id", "paymentId", "txRef", "txn")
          .as("payment_id"),
        pick("order_id", "orderId", "orderRef", "order.id", "order").as("order_id"),
        col("vendor"),
        Drift.toDoubleOrZero(pick("amountPaid", "amount_paid", "amount",
          "payment_amount", "totalAmount", "amt")).as("payment_amount"),
        Drift.normalizeStatus(pick("payment_status", "status", "state", "payment_state"))
          .as("payment_status"),
        pick("channel", "method", "payment_method", "paymentMethod").as("payment_method"),
        Drift.parseTimestampMulti(
          coalesce(pick("paid_at", "paidAt", "payment_date", "created_at", "timestamp", "ts"),
            col("event_time"))).as("payment_date"),
        col("event_id"))
      .filter(col("payment_id").isNotNull)
    // D2: first-wins per payment_id (append-only log, replays collapse)
    Dedup.firstWins(base, Seq("payment_id"),
      Seq(col("payment_date").asc_nulls_last, col("event_id").asc))
  }

  /** Refunds normalization (reference `src/transformer.py:92-127`).
    * Live refund payloads carry NO id field (every dialect in
    * `src/live_event_generator.py:67-76,107-115,143-151` omits one); the
    * reference keeps those rows with a null id and pandas' NaN-key dedup
    * then collapses ALL of them into one arbitrary row — a silent data
    * loss bug (preserved faithfully in `normalizeRefundsStrict`). Here an
    * id-less refund gets a deterministic fallback id derived from its
    * event_id: replays of the same event still collapse, distinct refunds
    * survive.
    */
  def normalizeRefunds(events: DataFrame): DataFrame = {
    val base = events.filter(col("event_type").isin(RefundTypes: _*))
      .select(
        coalesce(pick("refund_id", "id", "transaction_id"),
          concat(lit("RF-"), md5(col("event_id")))).as("refund_id"),
        pick("order_id", "orderId", "orderRef", "order.id", "order").as("order_id"),
        pick("payment_id", "paymentId", "transaction_id").as("payment_id"),
        col("vendor"),
        Drift.toDoubleOrZero(pick("amountRefunded", "amount", "refund_amount",
          "refundAmount", "totalAmount", "amt")).as("refund_amount"),
        pick("reason", "refund_reason").as("refund_reason"),
        pick("type", "refund_type").as("refund_type"),
        Drift.parseTimestampMulti(
          coalesce(pick("refunded_at", "refundedAt", "refund_date", "created_at", "ts"),
            col("event_time"))).as("refund_date"),
        col("event_id"))
      .filter(col("refund_id").isNotNull)
    Dedup.firstWins(base, Seq("refund_id"),
      Seq(col("refund_date").asc_nulls_last, col("event_id").asc))
  }

  // ---- Reference-fidelity ("strict") mode --------------------------------
  // The reference transformer recognizes ONLY the restricted event-type
  // lists and exact payload keys below (`src/transformer.py:20-41,192-194` —
  // quirk SURVEY §2.10.1): live dialect names like `payment_succeeded` /
  // `refund_issued` and nested order payload keys are invisible to it.
  // These variants reproduce that behavior bit-for-bit — verified against
  // the reference's committed `warehouse/facts/*.csv` golden files by
  // `GoldenParitySpec`. The extended normalizers above are the recommended
  // mode; strict mode exists to prove fidelity.

  val StrictOrderTypes: Seq[String] =
    Seq("historical_order", "order_created", "order_updated")
  val StrictPaymentTypes: Seq[String] =
    Seq("historical_payment", "payment_attempt", "payment_confirmed")
  val StrictRefundTypes: Seq[String] =
    Seq("historical_refund", "refund_created", "refund_processed")

  /** Live JSONL read that preserves ingestion order as a `_seq` column.
    * The reference's Mongo fetch returns insertion (= file) order and the
    * strict dedups tie-break on it; `coalesce(1)` serializes the read so
    * line position is global position. Parity tool for single files — for
    * bulk ingest use `readLive` (order-free, fully parallel).
    */
  def readLiveOrdered(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).coalesce(1)
      .select(monotonically_increasing_id().as("_seq"),
        get_json_object(col("value"), "$.event_id").as("event_id"),
        get_json_object(col("value"), "$.event_type").as("event_type"),
        get_json_object(col("value"), "$.event_time").as("event_time"),
        get_json_object(col("value"), "$.vendor").as("vendor"),
        get_json_object(col("value"), "$.payload").as("payload"),
        get_json_object(col("value"), "$.ingested_at").as("ingested_at"))
      .filter(col("event_id").isNotNull)

  /** Strict orders normalization (`src/transformer.py:20-41`): exact keys
    * only, no drift fallbacks, no event_time fallback, null order_ids kept
    * (they collapse into one dedup group exactly as pandas NaN keys do).
    * Pandas' stable sort-by-created_at / keep-last is a window over
    * (created_at desc_nulls_last, _seq desc). Input must carry `_seq`.
    */
  def normalizeOrdersStrict(events: DataFrame): DataFrame = {
    val base = events.filter(col("event_type").isin(StrictOrderTypes: _*))
      .select(
        pick("order_id").as("order_id"),
        pick("customerId").as("customer_id"),
        Drift.toDoubleOrZero(pick("totalAmount")).as("order_amount"),
        pick("state").as("order_status"),
        Drift.parseTimestampMulti(pick("created_at")).as("created_at"),
        col("event_id"), col("vendor"), col("event_type"), col("_seq"))
    Dedup.latestWins(base, Seq("order_id"),
      Seq(col("created_at").desc_nulls_last, col("_seq").desc))
      .drop("_seq")
  }

  /** Strict payments normalization (`src/transformer.py:44-89`):
    * drop_duplicates(keep first by ingestion order) per payment_id.
    */
  def normalizePaymentsStrict(events: DataFrame): DataFrame = {
    val base = events.filter(col("event_type").isin(StrictPaymentTypes: _*))
      .select(
        pick("transaction_id", "payment_id", "id", "paymentId").as("payment_id"),
        pick("order_id", "orderId").as("order_id"),
        Drift.toDoubleOrZero(pick("amountPaid", "amount", "payment_amount",
          "totalAmount")).as("payment_amount"),
        Drift.normalizeStatus(pick("payment_status", "status", "state"))
          .as("payment_status"),
        pick("channel", "method", "payment_method").as("payment_method"),
        Drift.parseTimestampMulti(pick("paid_at", "payment_date", "created_at"))
          .as("payment_date"),
        col("event_id"), col("vendor"), col("_seq"))
    Dedup.firstWins(base, Seq("payment_id"), Seq(col("_seq").asc)).drop("_seq")
  }

  /** Strict refunds normalization (`src/transformer.py:92-127`). */
  def normalizeRefundsStrict(events: DataFrame): DataFrame = {
    val base = events.filter(col("event_type").isin(StrictRefundTypes: _*))
      .select(
        pick("refund_id", "id", "transaction_id").as("refund_id"),
        pick("order_id", "orderId").as("order_id"),
        pick("payment_id", "paymentId", "transaction_id").as("payment_id"),
        Drift.toDoubleOrZero(pick("amountRefunded", "amount", "refund_amount",
          "totalAmount")).as("refund_amount"),
        pick("reason", "refund_reason").as("refund_reason"),
        pick("type", "refund_type").as("refund_type"),
        Drift.parseTimestampMulti(pick("refunded_at", "refund_date", "created_at"))
          .as("refund_date"),
        col("event_id"), col("vendor"), col("_seq"))
    Dedup.firstWins(base, Seq("refund_id"), Seq(col("_seq").asc)).drop("_seq")
  }

  /** A1: fact_order_daily (reference `src/transformer.py:130-165`, set-based
    * rewrite SURVEY §4.2).
    */
  def factOrderDaily(orders: DataFrame, payments: DataFrame,
                     refunds: DataFrame): DataFrame =
    DailyRevenue.dailyAggregate(
      orders, "order_id", col("created_at").cast("date"), col("vendor"),
      payments, "order_id", col("payment_amount"), col("payment_status"),
      refunds, "order_id", col("refund_amount"))

  /** dim_customer: distinct customers, first-seen (reference
    * `src/populate_dimensions.py:50-54`).
    */
  def dimCustomer(orders: DataFrame): DataFrame =
    Dimensions.firstSeen(orders, "customer_id", "created_at")
      .withColumnRenamed("first_seen", "created_at")
      .withColumn("customer_name", lit(null).cast("string"))
      .withColumn("email", lit(null).cast("string"))
      .withColumn("country", lit(null).cast("string"))

  /** dim_date 2023-2026 (reference `src/populate_dimensions.py:19-29`). */
  def dimDate(spark: SparkSession): DataFrame =
    Dimensions.dateSpine(spark, "2023-01-01", "2026-12-31")

  /** dim_product placeholder row (reference `src/populate_dimensions.py:70-76`
    * ships exactly one unknown-product row; payloads carry SKUs but no
    * product catalog exists to join against).
    */
  def dimProduct(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("UNKNOWN", "Product data not available", "N/A",
        null.asInstanceOf[String], 0.0))
      .toDF("product_id", "product_name", "category", "vendor_id", "unit_price")
  }

  /** One-row quality report (reference `src/quality_report.py`, schema
    * FIXTURES §5). Gross revenue here is the success-only definition —
    * deliberately distinct from fact_order_daily's all-status gross
    * (quirk SURVEY §2.10.2).
    */
  def qualityReport(orders: DataFrame, payments: DataFrame,
                    refunds: DataFrame): DataFrame = {
    // no cache() here: the result is one multi-branch plan consumed by a
    // single action, callers that reuse the inputs own their lifecycle
    // (runAll caches and releases them), and an operator-level cache would
    // leak for the session lifetime — the exact defect fixed in the dedup
    // operators this round
    val o = orders; val p = payments; val r = refunds
    // null-SAFE key matching (<=>) on the orphan and late-arrival joins:
    // pandas `isin`/`merge` treat NaN keys as equal to each other
    // (reference `src/quality_report.py:61-66,77-81`), so a payment with a
    // null order_id is NOT an orphan when a null-id order exists. A plain
    // equi-join would count it as one and drift off the published report.
    val orphanPay = p.join(o.select(col("order_id").as("__oid")).distinct(),
      col("order_id") <=> col("__oid"), "left_anti")
    val orphanRef = r.join(p.select(col("payment_id").as("__pid")).distinct(),
      col("payment_id") <=> col("__pid"), "left_anti")
    val late = p.select(col("order_id").as("__poid"), col("payment_date"))
      .join(o.select(col("order_id").as("__ooid"), col("created_at")),
        col("__poid") <=> col("__ooid"))
      .select((unix_timestamp(col("payment_date")) - unix_timestamp(col("created_at")))
        .cast("double")./(86400.0).as("delta"))

    o.agg(
        count(lit(1)).as("total_orders"),
        sum(when(col("customer_id").isNull, 1L).otherwise(0L)).as("orders_missing_customer_id"),
        sum(when(col("order_amount") === 0, 1L).otherwise(0L)).as("orders_missing_amount"))
      .crossJoin(p.agg(
        count(lit(1)).as("total_payments"),
        coalesce(sum(when(col("order_id").isNull, 1L).otherwise(0L)), lit(0L))
          .as("payments_missing_order_id"),
        // coalesce after the aggregate: sum/avg over an EMPTY payments or
        // refunds frame is NULL and would null out net_revenue downstream
        coalesce(round(sum(when(col("payment_status") === "success", col("payment_amount"))
          .otherwise(lit(0.0))), 2), lit(0.0)).as("gross_revenue"),
        round(avg(when(col("payment_status") === "success", 1.0).otherwise(0.0)), 4)
          .as("payment_success_rate")))
      .crossJoin(r.agg(
        count(lit(1)).as("total_refunds"),
        coalesce(sum(when(col("payment_id").isNull, 1L).otherwise(0L)), lit(0L))
          .as("refunds_missing_payment_id"),
        coalesce(round(sum(coalesce(col("refund_amount"), lit(0.0))), 2), lit(0.0))
          .as("total_refunded")))
      .crossJoin(orphanPay.agg(count(lit(1)).as("orphan_payments")))
      .crossJoin(orphanRef.agg(count(lit(1)).as("orphan_refunds")))
      .crossJoin(late.agg(
        sum(when(col("delta") > 7, 1L).otherwise(0L)).as("payments_over_7_days"),
        sum(when(col("delta") > 30, 1L).otherwise(0L)).as("payments_over_30_days"),
        round(avg(col("delta")), 2).as("avg_days_to_payment")))
      .withColumn("net_revenue", round(col("gross_revenue") - col("total_refunded"), 2))
      .withColumn("refund_rate",
        when(col("gross_revenue") > 0,
          round(col("total_refunded") / col("gross_revenue"), 4)))
  }

  /** Full ELT: feeds → ingest → normalize → facts + dims + report → sinks
    * with the reference's three output modes (append / upsert / overwrite,
    * `README.md:112-114`).
    */
  def runAll(spark: SparkSession, historical: Seq[String], live: Seq[String],
             outDir: String, warehouseDb: Option[String] = None): Map[String, Long] = {
    val feeds = historical.map(readHistorical(spark, _)) ++ live.map(readLive(spark, _))
    val events = ingest(feeds).cache()
    val orders = normalizeOrders(events).cache()
    val payments = normalizePayments(events).cache()
    val refunds = normalizeRefunds(events).cache()
    // daily is consumed up to three times (warehouse load, parquet sink,
    // final count) and its 3-shuffle join+aggregate is the most expensive
    // plan of the run — cache it too, released with the rest. The dims
    // are built once for the same reason.
    val daily = factOrderDaily(orders, payments, refunds).cache()
    val custDim = dimCustomer(orders)
    val dateDim = dimDate(spark)
    val prodDim = dimProduct(spark)
    val report = qualityReport(orders, payments, refunds)

    // optional S7 catalog path: full star-schema DDL + truncate-load,
    // alongside the parquet-directory sinks below
    warehouseDb.foreach { db =>
      graft.sources.Warehouse.createAll(spark, db)
      graft.sources.Warehouse.loadAll(spark, db, orders, payments, refunds,
        daily, custDim, dateDim, prodDim)
    }

    graft.sources.Sinks.upsertParquet(spark, orders, s"$outDir/fact_orders",
      Seq("order_id"), Seq(col("created_at").desc_nulls_last, col("event_id").desc))
    graft.sources.Sinks.appendParquet(payments, s"$outDir/fact_payments")
    graft.sources.Sinks.appendParquet(refunds, s"$outDir/fact_refunds")
    graft.sources.Sinks.overwriteParquet(daily, s"$outDir/fact_order_daily")
    graft.sources.Sinks.overwriteParquet(custDim, s"$outDir/dim_customer")
    graft.sources.Sinks.overwriteParquet(dateDim, s"$outDir/dim_date")
    graft.sources.Sinks.overwriteParquet(prodDim, s"$outDir/dim_product")
    graft.sources.Sinks.writeCsv(report, s"$outDir/quality_report")

    val counts = Map(
      "events" -> events.count(),
      "orders" -> orders.count(),
      "payments" -> payments.count(),
      "refunds" -> refunds.count(),
      "daily" -> daily.count())
    // all sinks and counts have materialized — release the run's caches
    Seq(events, orders, payments, refunds, daily)
      .foreach(_.unpersist(blocking = false))
    counts
  }
}
