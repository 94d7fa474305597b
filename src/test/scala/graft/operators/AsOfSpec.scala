package graft.operators

import graft.SparkSuite
import java.sql.Timestamp

class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("joinAsOf: inclusive latest-at-or-before per key, null when none") {
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5.0),
      (1L, ts("2024-01-01 12:00:00"), 7.0))
      .toDF("user_id", "ref_ts", "ref_value")
    val left = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L), // before any right → null
      (1L, ts("2024-01-01 10:00:00"), 101L), // exact tie → inclusive match
      (1L, ts("2024-01-01 11:30:00"), 102L), // between → 10:00 row
      (1L, ts("2024-01-01 13:00:00"), 103L), // after both → 12:00 row
      (2L, ts("2024-01-01 11:00:00"), 200L)) // key with no right rows
      .toDF("user_id", "ts", "event_id")
    val got = AsOf.joinAsOf(left, right, "user_id", "ts", "ref_ts",
        Seq("ref_ts", "ref_value"))
      .orderBy("event_id")
      .select("event_id", "ref_value")
      .as[(Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      (100L, None), (101L, Some(5.0)), (102L, Some(5.0)),
      (103L, Some(7.0)), (200L, None)))
  }

  test("joinAsOfForward: inclusive earliest-at-or-after per key, null when none") {
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5.0),
      (1L, ts("2024-01-01 12:00:00"), 7.0))
      .toDF("user_id", "ref_ts", "ref_value")
    val left = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L), // before both → 10:00 row
      (1L, ts("2024-01-01 12:00:00"), 101L), // exact tie → inclusive match
      (1L, ts("2024-01-01 11:30:00"), 102L), // between → 12:00 row
      (1L, ts("2024-01-01 13:00:00"), 103L), // after all right → null
      (2L, ts("2024-01-01 11:00:00"), 200L)) // key with no right rows
      .toDF("user_id", "ts", "event_id")
    val got = AsOf.joinAsOfForward(left, right, "user_id", "ts", "ref_ts",
        Seq("ref_ts", "ref_value"))
      .orderBy("event_id")
      .select("event_id", "ref_value")
      .as[(Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      (100L, Some(5.0)), (101L, Some(7.0)), (102L, Some(7.0)),
      (103L, None), (200L, None)))
  }

  test("forward as-of: a null left probe time yields null, not the partition history") {
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 5.0))
      .toDF("user_id", "ref_ts", "ref_value")
    val left = Seq((1L, Option.empty[Timestamp], 100L),
        (1L, Some(ts("2024-01-01 09:00:00")), 101L))
      .toDF("user_id", "ts", "event_id")
    val got = AsOf.joinAsOfForward(left, right, "user_id", "ts", "ref_ts",
        Seq("ref_value"))
      .orderBy("event_id")
      .select("event_id", "ref_value")
      .as[(Long, Option[Double])].collect().toSeq
    assert(got == Seq((100L, None), (101L, Some(5.0))))
  }
}
