package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the reference's committed golden CSVs (the fact and
  * dimension tables under `warehouse/`) — the normalized frames its
  * transformer actually produced, used as parity fixtures by
  * GoldenParitySpec and WarehouseSpec.
  */
object GoldenData {
  val Ref = "/root/reference"
  private val TsFmt = "yyyy-MM-dd HH:mm:ssXXX"

  def orders(spark: SparkSession): DataFrame =
    spark.read.option("header", "true")
      .csv(s"$Ref/warehouse/facts/fact_orders.csv")
      .select(col("order_id"), col("customer_id"),
        col("order_amount").cast("double").as("order_amount"),
        col("order_status"),
        to_timestamp(col("created_at"), TsFmt).as("created_at"),
        col("event_id"), col("vendor"), col("event_type"))

  def payments(spark: SparkSession): DataFrame =
    spark.read.option("header", "true")
      .csv(s"$Ref/warehouse/facts/fact_payments.csv")
      .select(col("payment_id"), col("order_id"),
        col("payment_amount").cast("double").as("payment_amount"),
        col("payment_status"), col("payment_method"),
        to_timestamp(col("payment_date"), TsFmt).as("payment_date"),
        col("event_id"), col("vendor"))

  def refunds(spark: SparkSession): DataFrame =
    spark.read.option("header", "true")
      .csv(s"$Ref/warehouse/facts/fact_refunds.csv")
      .select(col("refund_id"), col("order_id"), col("payment_id"),
        col("refund_amount").cast("double").as("refund_amount"),
        col("refund_reason"), col("refund_type"),
        to_timestamp(col("refund_date"), TsFmt).as("refund_date"),
        col("event_id"), col("vendor"))

  def daily(spark: SparkSession): DataFrame =
    spark.read.option("header", "true")
      .csv(s"$Ref/warehouse/facts/fact_order_daily.csv")
      .select(col("order_date").cast("date").as("order_date"), col("vendor"),
        col("gross_revenue").cast("double"), col("total_refunds").cast("double"),
        col("net_revenue").cast("double"), col("order_count").cast("long"),
        col("paid_count").cast("long"),
        col("payment_success_rate").cast("double"),
        col("refund_rate").cast("double"))

  def dimCustomer(spark: SparkSession): DataFrame =
    spark.read.option("header", "true")
      .csv(s"$Ref/warehouse/dimensions/dim_customer.csv")
      .select(col("customer_id"),
        to_timestamp(col("created_at"), TsFmt).as("created_at"),
        col("customer_name"), col("email"), col("country"))

  def dimDate(spark: SparkSession): DataFrame =
    spark.read.option("header", "true")
      .csv(s"$Ref/warehouse/dimensions/dim_date.csv")
      .select(col("date_key").cast("date").as("date_key"), col("day_of_week"),
        col("week_number").cast("long"), col("month").cast("long"),
        col("quarter").cast("long"), col("year").cast("long"),
        col("is_weekend").cast("boolean"))

  /** Canonical sorted row-string MULTISET for order-free whole-frame
    * comparison (a Set would hide duplicate-multiplicity regressions that
    * keep counts equal).
    */
  def canon(df: DataFrame, cols: Seq[org.apache.spark.sql.Column]): Seq[String] = {
    import df.sparkSession.implicits._
    df.select(concat_ws("|", cols.map(c => coalesce(c.cast("string"), lit("∅"))): _*))
      .as[String].collect().toSeq.sorted
  }
}
