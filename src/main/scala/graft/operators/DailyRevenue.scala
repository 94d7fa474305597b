package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The flagship aggregate: fact_order_daily (reference
  * `src/transformer.py:130-165`).
  *
  * The reference loops over (order_date, vendor) groups and runs a
  * correlated `isin` semi-join per group — accidentally quadratic
  * (SURVEY §4.2). The set-based rewrite below is three shuffles total
  * (payments⋈orders, refunds⋈orders, final groupBy) and scales linearly:
  * payments/refunds are attributed to their order's (date, vendor) via one
  * inner equi-join each, then everything aggregates in a single pass with
  * map-side partial aggregation.
  *
  * Semantics preserved from the reference:
  *  - gross_revenue sums ALL matched payments regardless of status
  *    (`src/transformer.py:141`, quirk SURVEY §2.10.2);
  *  - paid_count counts status=='success' payments;
  *  - payment_success_rate = paid_count / order_count, round 4, null when
  *    order_count = 0 (`src/transformer.py:142-150`, quirk §2.10.3 — it can
  *    exceed 1.0; preserved deliberately);
  *  - refund_rate = total_refunds / gross_revenue, round 4, null when
  *    gross <= 0 (`src/transformer.py:151`);
  *  - orders with null order_date are excluded (pandas groupby dropna).
  */
object DailyRevenue {

  /** Money sums are computed over integer-scaled amounts (4 decimal
    * digits): `sum(round(amount * 10^4)::long) / 10^4`. Integer summation
    * is associative, so the result is independent of partition/merge order
    * — bit-identical across engines and across cluster re-runs, where a
    * naive double sum drifts in the last ulps and flips `round(_, 2)` at
    * cent boundaries. Long capacity bounds: ~9.2e14 in money units — raise
    * to decimal aggregation if a single group can exceed that.
    */
  private val MoneyScale = 10000L

  /** THE money-sum rule, shared by every query that aggregates currency
    * (Extended's TPC-H anchors delegate here): one definition so a future
    * refinement — e.g. the decimal escape hatch above — lands everywhere.
    */
  def sumMoney(c: Column, scale: Long): Column =
    sum(round(c * scale).cast("long")) / scale.toDouble

  private def sumMoney(c: Column): Column = sumMoney(c, MoneyScale)

  /** Single-pass variant for the common case where payments and refunds
    * derive from ONE item stream (e.g. lineitem rows where some lines are
    * refunds): one scan and one attribution join instead of two of each —
    * at 100 TB the dominant cost of this aggregate is exactly those
    * scans/joins. Refund rows are flagged; both aggregates come out of a
    * single groupBy with conditional integer-scaled sums. Output is
    * bit-identical to `dailyAggregate` on the equivalent split inputs.
    */
  def dailyAggregateFromItems(
      orders: DataFrame, orderId: String, orderDate: Column, dim: Column,
      items: DataFrame, itemOrderId: String, payAmount: Column, payStatus: Column,
      refundFlag: Column, refundAmount: Column): DataFrame = {

    val orderKey = orders
      .select(col(orderId).as("order_id"), orderDate.as("order_date"), dim.as("vendor"))
      .filter(col("order_date").isNotNull)

    val itemAgg = items
      .select(col(itemOrderId).as("order_id"), payAmount.as("amount"),
        payStatus.as("status"), refundFlag.as("is_refund"), refundAmount.as("r_amount"))
      .join(orderKey, "order_id")
      .groupBy("order_date", "vendor")
      .agg(
        sumMoney(col("amount")).as("gross_revenue"),
        sum(when(col("status") === "success", 1L).otherwise(0L)).as("paid_count"),
        sumMoney(when(col("is_refund"), col("r_amount")).otherwise(lit(0.0)))
          .as("total_refunds"))

    orderKey
      .groupBy("order_date", "vendor")
      .agg(count(lit(1)).as("order_count"))
      .join(itemAgg, Seq("order_date", "vendor"), "left")
      .na.fill(0.0, Seq("gross_revenue", "total_refunds"))
      .na.fill(0L, Seq("paid_count"))
      .withColumn("net_revenue", col("gross_revenue") - col("total_refunds"))
      .withColumn("payment_success_rate",
        when(col("order_count") > 0, round(col("paid_count") / col("order_count"), 4)))
      .withColumn("refund_rate",
        when(col("gross_revenue") > 0, round(col("total_refunds") / col("gross_revenue"), 4)))
      .select("order_date", "vendor", "gross_revenue", "total_refunds",
        "net_revenue", "order_count", "paid_count", "payment_success_rate", "refund_rate")
  }

  /** @param orders   one row per order: (orderId, dateCol, dimCol, ...)
    * @param payments (orderId, amount, status)
    * @param refunds  (orderId, amount)
    */
  def dailyAggregate(
      orders: DataFrame, orderId: String, orderDate: Column, dim: Column,
      payments: DataFrame, payOrderId: String, payAmount: Column, payStatus: Column,
      refunds: DataFrame, refOrderId: String, refAmount: Column): DataFrame = {

    val orderKey = orders
      .select(col(orderId).as("order_id"), orderDate.as("order_date"), dim.as("vendor"))
      .filter(col("order_date").isNotNull)

    val payAgg = payments
      .select(col(payOrderId).as("order_id"), payAmount.as("amount"), payStatus.as("status"))
      .join(orderKey, "order_id")
      .groupBy("order_date", "vendor")
      .agg(
        sumMoney(col("amount")).as("gross_revenue"),
        sum(when(col("status") === "success", 1L).otherwise(0L)).as("paid_count"))

    val refAgg = refunds
      .select(col(refOrderId).as("order_id"), refAmount.as("amount"))
      .join(orderKey, "order_id")
      .groupBy("order_date", "vendor")
      .agg(sumMoney(col("amount")).as("total_refunds"))

    orderKey
      .groupBy("order_date", "vendor")
      .agg(count(lit(1)).as("order_count"))
      .join(payAgg, Seq("order_date", "vendor"), "left")
      .join(refAgg, Seq("order_date", "vendor"), "left")
      .na.fill(0.0, Seq("gross_revenue", "total_refunds"))
      .na.fill(0L, Seq("paid_count"))
      // amounts are exact multiples of 10^-4 after integer-scaled summation;
      // re-rounding to 2 decimals would hit true midpoints (x.xx5) where
      // engines disagree on shortest-repr vs binary rounding — keep exact.
      .withColumn("net_revenue", col("gross_revenue") - col("total_refunds"))
      .withColumn("payment_success_rate",
        when(col("order_count") > 0, round(col("paid_count") / col("order_count"), 4)))
      .withColumn("refund_rate",
        when(col("gross_revenue") > 0, round(col("total_refunds") / col("gross_revenue"), 4)))
      .select("order_date", "vendor", "gross_revenue", "total_refunds",
        "net_revenue", "order_count", "paid_count", "payment_success_rate", "refund_rate")
  }
}
