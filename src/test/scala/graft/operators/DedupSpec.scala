package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class DedupSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("latestWins keeps greatest order value; nulls lose to non-nulls; event_id tiebreaks") {
    val df = Seq(
      ("o1", ts("2024-01-01 10:00:00"), "e1", 10.0),
      ("o1", ts("2024-01-02 10:00:00"), "e2", 20.0), // latest -> wins
      ("o1", null.asInstanceOf[Timestamp], "e3", 30.0), // null ts loses
      ("o2", ts("2024-01-01 10:00:00"), "e4", 1.0),
      ("o2", ts("2024-01-01 10:00:00"), "e5", 2.0)  // same ts -> higher event_id wins
    ).toDF("order_id", "created_at", "event_id", "amount")
    val got = Dedup.latestWins(df, Seq("order_id"),
        Seq($"created_at".desc_nulls_last, $"event_id".desc))
      .select("order_id", "event_id").as[(String, String)].collect().toMap
    assert(got == Map("o1" -> "e2", "o2" -> "e5"))
  }

  test("dedup is idempotent: applying twice equals applying once") {
    val ev = graft.Tables.events(spark, sf)
    val once = Dedup.ingestDedup(ev.unionByName(ev), "event_id", "ts")
    val twice = Dedup.ingestDedup(once, "event_id", "ts")
    assert(once.count() == twice.count())
    assert(once.count() == ev.select("event_id").distinct().count())
  }

  test("firstWins keeps earliest by explicit order") {
    val df = Seq(
      ("p1", ts("2024-01-01 10:00:00"), "a"),
      ("p1", ts("2024-01-02 10:00:00"), "b")
    ).toDF("payment_id", "at", "tag")
    val got = Dedup.firstWins(df, Seq("payment_id"), Seq($"at".asc, $"tag".asc))
      .select("tag").as[String].collect()
    assert(got.toSeq == Seq("a"))
  }
}
