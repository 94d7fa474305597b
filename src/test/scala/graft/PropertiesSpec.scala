package graft

import graft.normalize.Drift
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5): dedup idempotence, coalesce
  * totality, daily-aggregate arithmetic. Raw ScalaCheck generators sampled
  * over fixed seeds (no scalatest bridge in the offline cache).
  */
class PropertiesSpec extends SparkSuite {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val keyGen = Gen.chooseNum(0L, 20L)
  private val rowsGen = Gen.listOfN(60,
    Gen.zip(keyGen, Gen.chooseNum(0L, 1000000L), Gen.chooseNum(0.0, 500.0)))

  test("property: latestWins is idempotent and keeps exactly one row per key") {
    for (rows <- samples(rowsGen, 5) if rows.nonEmpty) {
      val df = rows.toDF("k", "ord", "v")
      val once = Dedup.latestWins(df, Seq("k"), Seq($"ord".desc, $"v".desc))
      val twice = Dedup.latestWins(once, Seq("k"), Seq($"ord".desc, $"v".desc))
      val keys = rows.map(_._1).distinct.size.toLong
      assert(once.count() == keys)
      assert(twice.collect().toSet == once.collect().toSet)
    }
  }

  test("property: status normalization is total and lands in the closed bucket set") {
    val statusGen = Gen.oneOf(
      Gen.oneOf("failed", "FAIL", "Error", "success", "PAID", "Completed", "pending"),
      Gen.alphaNumStr.map(_.take(12)))
    for (statuses <- samples(Gen.listOfN(30, statusGen), 5) if statuses.nonEmpty) {
      val got = statuses.toDF("s").select(Drift.normalizeStatus($"s")).as[String].collect()
      assert(got.length == statuses.length)
      got.zip(statuses).foreach { case (norm, raw) =>
        val lc = raw.trim.toLowerCase
        if (Seq("failed", "fail", "error").contains(lc)) assert(norm == "failed")
        else if (Seq("success", "successful", "completed", "paid").contains(lc)) assert(norm == "success")
        else assert(norm == lc)
      }
    }
  }

  test("property: coalesce-chain totality — result is first non-null or null") {
    val optGen = Gen.option(Gen.alphaNumStr.map(_.take(6)))
    for (rows <- samples(Gen.listOfN(25, Gen.zip(optGen, optGen, optGen)), 5)
         if rows.nonEmpty) {
      val got = rows.toDF("a", "b", "c")
        .select(coalesce($"a", $"b", $"c")).as[Option[String]].collect()
      got.zip(rows).foreach { case (g, (a, b, c)) =>
        assert(g == a.orElse(b).orElse(c))
      }
    }
  }

  test("property: daily aggregate net = gross - refunds and counts are consistent") {
    val ordersGen = Gen.listOfN(20, Gen.zip(
      Gen.chooseNum(1, 5).map(d => java.sql.Date.valueOf(f"2024-01-$d%02d")),
      Gen.oneOf("v_a", "v_b")))
    for (os <- samples(ordersGen, 5) if os.nonEmpty) {
      val orders = os.zipWithIndex
        .map { case ((dt, v), i) => (s"o$i", dt, v) }.toDF("order_id", "odate", "vendor")
      val payments = os.indices.map(i => (s"o$i", (i % 7) * 10.0,
        if (i % 3 == 0) "success" else "failed")).toDF("order_id", "amount", "status")
      val refunds = os.indices.filter(_ % 4 == 0)
        .map(i => (s"o$i", 5.0)).toDF("order_id", "amount")
      val daily = graft.operators.DailyRevenue.dailyAggregate(
        orders, "order_id", $"odate", $"vendor",
        payments, "order_id", $"amount", $"status",
        refunds, "order_id", $"amount").collect()
      daily.foreach { r =>
        assert(r.getAs[Double]("net_revenue") ==
          r.getAs[Double]("gross_revenue") - r.getAs[Double]("total_refunds"))
        assert(r.getAs[Long]("order_count") > 0)
      }
      assert(daily.map(_.getAs[Long]("order_count")).sum == os.size)
    }
  }
}
