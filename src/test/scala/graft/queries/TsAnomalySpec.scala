package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Behavioral locks for the rolling integer z-test on constructed
  * series — the oracle certifies the orders-derived result; these pin
  * the detector's semantics where the corpus can't (planted spike,
  * zero-variance baseline, baseline non-dilution).
  */
class TsAnomalySpec extends SparkSuite {
  import spark.implicits._

  private def series(vals: Seq[Long]) =
    vals.zipWithIndex
      .map { case (v, i) => (java.sql.Date.valueOf("2024-01-%02d".format(i + 1)), v) }
      .toDF("day", "cents")
      .select(col("day"), col("cents").cast(DecimalType(38, 0)).as("cents"))

  private def flags(vals: Seq[Long]): Map[String, Boolean] =
    Analytics.rollingZFlags(series(vals))
      .collect().map(r => r.getDate(0).toString -> r.getBoolean(2)).toMap

  test("a spike against a noisy-but-stable week is flagged; normal days are not") {
    // 7 baseline days around 1000 (nonzero variance), then a 10x spike
    val f = flags(Seq(1000L, 1010, 990, 1005, 995, 1000, 1002, 10000))
    assert(f == Map("2024-01-08" -> true))
  }

  test("zero-variance baseline: any deviation flags, equality does not") {
    // strict inequality: lhs = 0 vs rhs = 0 on a perfectly flat series
    val flat = flags(Seq.fill(9)(500L))
    assert(flat.values.forall(_ == false))
    val dev = flags(Seq.fill(7)(500L) :+ 501L)
    assert(dev("2024-01-08"))
  }

  test("the trailing frame excludes the current day — a spike cannot dilute " +
    "its own baseline, and the NEXT day is judged against a window " +
    "containing the spike") {
    // day 8 spikes; day 9 returns to baseline but its window now holds
    // the spike, inflating variance — 9 must NOT flag (the test is
    // against the window including the outlier, which is the documented
    // trailing-frame semantics, not a robust-MAD fence)
    val f = flags(Seq(1000L, 1010, 990, 1005, 995, 1000, 1002, 10000, 1000))
    assert(f("2024-01-08"))
    assert(!f("2024-01-09"))
  }
}
