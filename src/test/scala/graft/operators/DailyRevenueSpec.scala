package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.sql.Date

class DailyRevenueSpec extends SparkSuite {
  import spark.implicits._

  test("daily aggregate preserves reference quirks: failed payments in gross, " +
       "null refund_rate on zero gross, success rate can exceed 1") {
    val orders = Seq(
      ("o1", Date.valueOf("2024-01-01"), "v_a"),
      ("o2", Date.valueOf("2024-01-01"), "v_a"),
      ("o3", Date.valueOf("2024-01-02"), "v_b") // no payments -> zero gross
    ).toDF("order_id", "odate", "vendor")
    val payments = Seq(
      ("o1", 100.0, "success"),
      ("o1", 50.0, "failed"),   // counted in gross (quirk §2.10.2)
      ("o1", 25.0, "success"),  // 3 payments on 1 order
      ("o2", 10.0, "success"),
      ("oX", 999.0, "success")  // orphan -> excluded
    ).toDF("order_id", "amount", "status")
    val refunds = Seq(("o1", 30.0)).toDF("order_id", "amount")

    val got = DailyRevenue.dailyAggregate(
      orders, "order_id", $"odate", $"vendor",
      payments, "order_id", $"amount", $"status",
      refunds, "order_id", $"amount").orderBy("order_date", "vendor").collect()

    assert(got.length == 2)
    val d1 = got(0)
    assert(d1.getAs[Double]("gross_revenue") == 185.0) // 100+50+25+10, failed included
    assert(d1.getAs[Double]("total_refunds") == 30.0)
    assert(d1.getAs[Double]("net_revenue") == 155.0)
    assert(d1.getAs[Long]("order_count") == 2L)
    assert(d1.getAs[Long]("paid_count") == 3L)
    assert(d1.getAs[Double]("payment_success_rate") == 1.5) // 3 paid / 2 orders > 1 (quirk §2.10.3)
    val d2 = got(1)
    assert(d2.getAs[Double]("gross_revenue") == 0.0)
    assert(d2.isNullAt(d2.fieldIndex("refund_rate"))) // zero-gross guard
    assert(d2.isNullAt(d2.fieldIndex("payment_success_rate")) == false)
    assert(d2.getAs[Double]("payment_success_rate") == 0.0)
  }

  test("orders with null dates are excluded (pandas groupby dropna parity)") {
    val orders = Seq(("o1", Option.empty[Date], "v")).toDF("order_id", "odate", "vendor")
    val empty = Seq.empty[(String, Double, String)].toDF("order_id", "amount", "status")
    val emptyR = Seq.empty[(String, Double)].toDF("order_id", "amount")
    val got = DailyRevenue.dailyAggregate(
      orders, "order_id", $"odate", $"vendor",
      empty, "order_id", $"amount", $"status",
      emptyR, "order_id", $"amount")
    assert(got.count() == 0)
  }
}
