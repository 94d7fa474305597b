package graft.queries

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSuite {

  test("a14 fold over persisted state is bit-identical to the full recompute") {
    val folded = Incremental.a14IncrementalAgg(spark, sf).collect().toSeq
    val full = Tables.orders(spark, sf)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(round(col("o_totalprice") * 100).cast("long")) / 100.0).as("gross"),
        (max(round(col("o_totalprice") * 100).cast("long")) / 100.0).as("max_price"))
      .orderBy("day")
      .collect().toSeq
    assert(folded === full,
      "incremental rollup maintenance must be indistinguishable from recompute")
  }

  test("the batch genuinely overlaps days the state already covers") {
    // guard the split design: if a refactor moved the split to the date
    // axis, every fold would be a disjoint append and the merge of
    // same-key partials — the thing the query demonstrates — would never
    // execute. Orderkeys ending in 0 must share days with the rest.
    val o = Tables.orders(spark, sf)
      .select(col("o_orderdate").cast("date").as("day"),
        (col("o_orderkey") % 10 === 0).as("in_batch"))
    val overlap = o.groupBy("day")
      .agg(countDistinct(col("in_batch")).as("sides"))
      .filter(col("sides") === 2).count()
    // sf0.001 has ~1500 orders over ~2400 days, so most days hold a
    // single order and can't overlap; ~70 two-sided days is real overlap.
    // A date-axis split would yield exactly 0.
    assert(overlap > 10,
      s"only $overlap days carry both state and batch rows — split degenerated")
  }

  test("scd2 fold over the persisted dimension equals the full-history rebuild") {
    val folded = Incremental.scd2Merge(spark, sf).collect().toSeq
    val full = Analytics.scd2Runs(spark, sf).collect().toSeq
    assert(folded === full,
      "incremental SCD2 maintenance must rebuild the dimension bit-exactly")
  }

  test("the scd2 fold genuinely exercises the open-run merge path") {
    // at least one user's open run must continue across the cutoff —
    // otherwise the stitch logic (count addition, validity concatenation,
    // id shift, open-run replacement) would be dead code the equality
    // test can't distinguish from a plain append
    val cutoff = java.sql.Timestamp.valueOf("2024-01-24 00:00:00")
    val crossing = Incremental.scd2Merge(spark, sf)
      .filter(col("valid_from") < lit(cutoff) && col("valid_to") >= lit(cutoff)
        && col("n_events") > 1)
      .count()
    assert(crossing > 0,
      "no run spans the cutoff — the merge branch was never taken")
  }
}
