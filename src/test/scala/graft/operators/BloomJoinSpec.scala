package graft.operators

import graft.SparkSuite
import graft.plans.BloomMightContain
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSuite {

  test("expression: no false negatives, interpreted and codegen paths agree") {
    import spark.implicits._
    val keys = (0L until 1000L).filter(_ % 3 == 0)
    val bf = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
    keys.foreach(bf.putLong)
    val bc = spark.sparkContext.broadcast(bf)
    val df = (0L until 1000L).toDF("k")
      .select(col("k"), BloomMightContain.mightContain(col("k"), bc).as("hit"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // contract: every inserted key MUST hit (false negatives would make
    // the pruned join lose rows)
    assert(keys.forall(rows(_)))
    // and the filter is actually selective (not degenerate all-true)
    val nonMembers = (0L until 1000L).filterNot(_ % 3 == 0)
    assert(nonMembers.count(rows(_)) < nonMembers.size / 2)
    // null keys stay null-safe (filter drops them, like the exact join)
    val nullHit = Seq[java.lang.Long](null).toDF("k")
      .select(BloomMightContain.mightContain(col("k"), bc)).collect()(0)
    assert(nullHit.isNullAt(0))
  }

  test("pruned semi join returns exactly the plain semi join's rows") {
    val fact = graft.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val dim = graft.Tables.customer(spark, sf)
      .filter(col("c_acctbal") > 9000).select("c_custkey")
    val pruned = BloomJoin.prunedSemiJoin(fact, "o_custkey", dim, "c_custkey",
      expectedKeys = 10000, fpp = 0.01)
    val plain = fact.join(dim, col("o_custkey") === col("c_custkey"), "left_semi")
    assert(pruned.count() == plain.count())
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("the bloom filter sits in the plan (pre-shuffle prune is real)") {
    val fact = graft.Tables.orders(spark, sf).select("o_custkey", "o_totalprice")
    val dim = graft.Tables.customer(spark, sf)
      .filter(col("c_acctbal") > 9000).select("c_custkey")
    val p = BloomJoin.prunedSemiJoin(fact, "o_custkey", dim, "c_custkey", 10000)
      .queryExecution.executedPlan.toString
    assert(p.contains("bloom_might_contain"), p)
  }
}
