package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("bucketized range join equals the brute-force formulation") {
    // deterministic scatter incl. exact-boundary deltas (±window) and a
    // hot key with many events
    val left = (1 to 200).map(i => (i.toLong % 5, i.toLong, ts(i * 137L)))
      .toDF("k", "lid", "lts")
    val right = (1 to 300).map(j => (j.toLong % 5, j.toLong, ts(j * 89L + 60)))
      .toDF("k", "rid", "rts")
    val got = RangeJoin.innerWithin(left, right, "k", "lts", "rts", windowSec = 300L)
      .select("k", "lid", "rid").as[(Long, Long, Long)].collect().toSet
    val brute = left.join(right, "k")
      .filter(abs(unix_micros(col("lts")) - unix_micros(col("rts"))) <= 300L * 1000000L)
      .select("k", "lid", "rid").as[(Long, Long, Long)].collect().toSet
    assert(got == brute && got.nonEmpty)
  }

  test("the live optimizer rule does not stack a second explosion on the manual rewrite") {
    // the residual abs-filter is pushed into the join condition, where
    // RewriteBoundedIntervalJoin (active in this production-wired
    // session) would see a rewritable band; the reserved bin-column name
    // must make its re-entry guard skip. One Generate = one explosion.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1") // force big-big, where the rule would fire
    try {
      val left = (1 to 50).map(i => (i.toLong % 5, i.toLong, ts(i * 137L)))
        .toDF("k", "lid", "lts")
      val right = (1 to 50).map(j => (j.toLong % 5, j.toLong, ts(j * 89L + 60)))
        .toDF("k", "rid", "rts")
      val plan = RangeJoin.innerWithin(left, right, "k", "lts", "rts", 300L)
        .queryExecution.optimizedPlan.toString
      assert("Generate explode".r.findAllIn(plan).size == 1, plan)
    } finally spark.conf.set(key, prev)
  }

  test("exact boundary: a match at precisely ±window survives, one microsecond past does not") {
    val left = Seq((1L, 10L, ts(10000))).toDF("k", "lid", "lts")
    val right = Seq(
      (1L, 1L, new java.sql.Timestamp(10300L * 1000)),            // +300s exactly
      (1L, 2L, new java.sql.Timestamp(10300L * 1000 + 1)),        // +300s + 1ms
      (1L, 3L, new java.sql.Timestamp(9700L * 1000))              // -300s exactly
    ).toDF("k", "rid", "rts")
    val got = RangeJoin.innerWithin(left, right, "k", "lts", "rts", 300L)
      .select("rid").as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }
}
