package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-cardinality and approximate-quantile operators — the
  * 100 TB path where an exact distinct or exact percentile would shuffle
  * (or buffer) the full value set per group.
  *
  * Why sketches at scale: `countDistinct` shuffles every distinct value;
  * `percentile` materializes every group value in one aggregation buffer.
  * An HLL/KLL-style sketch is a few KB per group regardless of input
  * size, merges associatively (map-side partial aggregation works, grain
  * rollups need no rescan), and its error is a tunable constant.
  *
  * These are spec-verified (`SketchesSpec` bounds the error against the
  * exact answers) rather than oracle-checked: sketch internals are
  * engine-specific, so cross-engine hash parity is impossible by design.
  */
object Sketches {

  /** Distinct users per event type via Apache DataSketches HLL
    * (`lgConfigK` = 12 → ~1.6% standard error, 4 KB sketches): map-side
    * sketch per partition, merge, estimate. No shuffle of user ids —
    * only fixed-size sketch blobs cross the wire.
    */
  def approxUsersByType(ev: DataFrame): DataFrame =
    ev.filter(col("user_id").isNotNull)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .cast("long").as("approx_users"))

  /** Global distinct by UNIONING the per-type sketches — the rollup path:
    * sketch once at the finest grain, merge upward at any coarser grain
    * without touching the raw data again.
    */
  def approxUsersGlobal(ev: DataFrame): DataFrame =
    ev.filter(col("user_id").isNotNull)
      .groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
        .cast("long").as("approx_users"))

  /** 7-day rolling distinct active users via sliding HLL union — the
    * sketch path for `ScaleOps.evRollingActive` (which stays the exact,
    * oracle-checked entry). The exact formulation pays a fixed 7×
    * (user, day) explode plus a second distinct; here each day is
    * sketched ONCE (one shuffle at day grain) and the rolling window
    * unions 7 fixed-size sketches per day — no explode, no second
    * distinct, and the shuffle after the daily agg carries one 4 KB blob
    * per day regardless of user cardinality. The unpartitioned window is
    * safe because its input is the DAY dimension (a few thousand rows at
    * any data scale), not the event stream.
    */
  def approxRollingActive(ev: DataFrame, lgK: Int = 12): DataFrame = {
    val daily = ev
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("ts").cast("date").as("day"))
      .groupBy("day")
      .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("sk"))
    val w = Window.orderBy("dn").rangeBetween(-6, 0)
    daily
      .withColumn("dn", datediff(col("day"), lit("1970-01-01").cast("date")))
      .select(col("day"),
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)).over(w))
          .cast("long").as("active_7d"))
      .orderBy("day")
  }

  /** One-pass heavy-hitter frequencies via Count-Min sketch: the
    * fixed-size (w×d counters) alternative to a full `groupBy(token)`
    * when the vocabulary itself is too large to shuffle — a 100 TB corpus
    * has billions of distinct tokens, but the sketch stays
    * `ceil(e/eps) × ceil(ln(1/δ))` counters no matter what. Per-partition
    * sketches merge map-side (the agg is distributive), so ONE binary
    * blob reaches the driver. Estimates overcount by at most eps·N with
    * probability `confidence` and never undercount — the right bias for
    * screening candidates that a second exact pass confirms.
    */
  def tokenCountSketch(docs: DataFrame, eps: Double = 0.0001,
                       confidence: Double = 0.99, seed: Int = 42): DataFrame =
    docs
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("token"))
      .agg(count_min_sketch(col("token"), lit(eps), lit(confidence), lit(seed))
        .as("sketch"))

  /** Bounded-memory percentiles: `percentile_approx` keeps an
    * `accuracy`-bounded summary per group instead of every value.
    */
  def approxPricePercentiles(orders: DataFrame, accuracy: Int = 10000): DataFrame =
    orders.groupBy("o_orderstatus")
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(accuracy))
          .as("median_price"),
        percentile_approx(col("o_totalprice"), lit(0.9), lit(accuracy))
          .as("p90_price"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
}
