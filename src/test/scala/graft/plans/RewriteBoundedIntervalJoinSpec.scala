package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RewriteBoundedIntervalJoinSpec extends SparkSuite {

  private def withRule[T](f: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RewriteBoundedIntervalJoin
    try f finally spark.experimental.extraOptimizations = prev
  }

  private def withThreshold[T](v: String)(f: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, v)
    try f finally spark.conf.set(key, prev)
  }

  // key-skewed on purpose: k=0 holds most rows on both sides — the shape
  // where the naive per-key cartesian detonates
  private lazy val left = spark.range(0, 400)
    .select(when(col("id") < 300, 0L).otherwise(col("id") % 7).as("k"),
      timestamp_micros(col("id") * 1000000L).as("lts"), col("id").as("lid"))
  private lazy val right = spark.range(0, 400)
    .select(when(col("id") < 300, 0L).otherwise(col("id") % 7).as("k2"),
      timestamp_micros(col("id") * 900000L + 123L).as("rts"), col("id").as("rid"))

  private def naive = left.join(right,
    col("k") === col("k2")
      && abs(unix_micros(col("lts")) - unix_micros(col("rts"))) <= lit(3000000L))

  private def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("rewrite fires on a big-big interval join and matches the naive result") {
    val expected = pairs(naive) // no rule: plain filtered join is the oracle
    assert(expected.nonEmpty)
    withThreshold("-1") { withRule {
      val df = naive
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("__graft_bin"), s"rule did not fire:\n$opt")
      assert(pairs(df) == expected) // same matches, no dups, none lost
    }}
  }

  test("interval-literal predicate form is recognized too") {
    val cond = col("k") === col("k2") &&
      expr("abs(lts - rts) <= INTERVAL 3 SECONDS")
    val expected = pairs(left.join(right, cond))
    withThreshold("-1") { withRule {
      val df = left.join(right, cond)
      assert(df.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      assert(pairs(df) == expected)
    }}
  }

  test("skips when a side is broadcastable (BNLJ over a tiny side is fine)") {
    withRule { // default 10MB threshold: both sides are tiny
      assert(!naive.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
    }
  }

  test("skips non-inner joins and plain equi-joins") {
    withThreshold("-1") { withRule {
      val outer = left.join(right, col("k") === col("k2")
        && abs(unix_micros(col("lts")) - unix_micros(col("rts"))) <= lit(3000000L),
        "left_outer")
      assert(!outer.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      val equi = left.join(right, col("k") === col("k2"))
      assert(!equi.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
    }}
  }
}
