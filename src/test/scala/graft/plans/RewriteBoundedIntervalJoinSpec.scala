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

  test("left-outer interval join fires (explode-right) and matches the naive result") {
    val cond = col("k") === col("k2") &&
      abs(unix_micros(col("lts")) - unix_micros(col("rts"))) <= lit(3000000L)
    def naiveOuter = left.join(right, cond, "left_outer")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("lid", "rid").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSeq.sorted
    val expected = rows(naiveOuter)
    withThreshold("-1") { withRule {
      val df = naiveOuter
      assert(df.queryExecution.optimizedPlan.toString.contains("__graft_bin_r"),
        df.queryExecution.optimizedPlan.toString)
      // preserved-side rows must not duplicate; null-extensions stay 1:1
      assert(rows(df) == expected)
    }}
  }

  test("left-semi and left-anti interval joins fire and match") {
    val cond = col("k") === col("k2") &&
      abs(unix_micros(col("lts")) - unix_micros(col("rts"))) <= lit(3000000L)
    for (jt <- Seq("left_semi", "left_anti")) {
      def naiveJt = left.join(right, cond, jt)
      val expected = naiveJt.select("lid").collect().map(_.getLong(0)).toSeq.sorted
      withThreshold("-1") { withRule {
        val df = left.join(right, cond, jt)
        assert(df.queryExecution.optimizedPlan.toString.contains("__graft_bin"), jt)
        assert(df.select("lid").collect().map(_.getLong(0)).toSeq.sorted == expected, jt)
      }}
    }
  }

  test("right-outer interval join fires (explode-left) and matches the naive result") {
    val cond = col("k") === col("k2") &&
      abs(unix_micros(col("lts")) - unix_micros(col("rts"))) <= lit(3000000L)
    def naiveOuter = left.join(right, cond, "right_outer")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("lid", "rid").collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1)))
        .toSeq.sorted
    val expected = rows(naiveOuter)
    withThreshold("-1") { withRule {
      val df = naiveOuter
      assert(df.queryExecution.optimizedPlan.toString.contains("__graft_bin_l"),
        df.queryExecution.optimizedPlan.toString)
      assert(rows(df) == expected)
    }}
  }

  test("bounded as-of band (BETWEEN) fires and matches: argmin candidate join rescued") {
    // the naive bounded as-of candidate join: every right row within the
    // trailing 5s window; the argmax-by-rts window on top stays intact —
    // only the quadratic candidate join underneath gets bucketized
    val cond = col("k") === col("k2") &&
      col("rts") >= col("lts") - expr("INTERVAL 5 SECONDS") && col("rts") <= col("lts")
    def naiveBand = left.join(right, cond)
    val expected = pairs(naiveBand)
    assert(expected.nonEmpty)
    withThreshold("-1") { withRule {
      val df = naiveBand
      assert(df.queryExecution.optimizedPlan.toString.contains("__graft_bin"),
        df.queryExecution.optimizedPlan.toString)
      assert(pairs(df) == expected)
    }}
  }

  test("strict one-sided bounds tighten by 1µs and still match") {
    val cond = col("k") === col("k2") &&
      unix_micros(col("lts")) - unix_micros(col("rts")) < lit(2000000L) &&
      unix_micros(col("lts")) - unix_micros(col("rts")) > lit(-1000000L)
    val expected = pairs(left.join(right, cond))
    withThreshold("-1") { withRule {
      val df = left.join(right, cond)
      assert(df.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      assert(pairs(df) == expected)
    }}
  }

  test("skips full-outer, one-sided-only, and plain equi-joins") {
    withThreshold("-1") { withRule {
      val full = left.join(right, col("k") === col("k2")
        && abs(unix_micros(col("lts")) - unix_micros(col("rts"))) <= lit(3000000L),
        "full_outer")
      assert(!full.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      // an upper bound alone is an unbounded half-plane — no band, no bins
      val oneSided = left.join(right, col("k") === col("k2")
        && unix_micros(col("lts")) - unix_micros(col("rts")) <= lit(3000000L))
      assert(!oneSided.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      val equi = left.join(right, col("k") === col("k2"))
      assert(!equi.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
    }}
  }
}
