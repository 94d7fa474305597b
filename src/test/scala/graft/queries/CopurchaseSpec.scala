package graft.queries

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** The shared co-purchase derivation is consumed by three oracle-gated
  * queries, so its own contract gets locked directly: the staged pair
  * counts must equal the naive DISTINCT self-join formulation (the
  * definition, expressed the expensive way), and repeat calls must reuse
  * the staged artifact rather than re-running the basket expansion.
  */
class CopurchaseSpec extends SparkSuite {

  test("pairCounts equals the naive distinct self-join definition") {
    val got = Copurchase.pairCounts(spark, sf)
    val b = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val naive = b.as("x").join(b.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .groupBy(col("x.pk").as("pa"), col("y.pk").as("pb"))
      .agg(count(lit(1)).as("w"))
    assert(got.count() === naive.count())
    assert(got.except(naive).count() === 0L)
    assert(naive.except(got).count() === 0L)
  }

  test("repeat calls reuse the staged artifact (memoized per session+dir)") {
    // both calls read the SAME staged parquet — the basket-expansion
    // shuffle runs once per (session, sfDir), which is the whole point.
    // Frames are fresh reads, not one cached object: the memo stores the
    // scratch PATH (a cached DataFrame would pin its session in the
    // weak-keyed map — see Scratch.stagedFrame)
    val a = Copurchase.pairCounts(spark, sf)
    val b = Copurchase.pairCounts(spark, sf)
    assert(a.inputFiles.nonEmpty && a.inputFiles.sorted.sameElements(b.inputFiles.sorted))
  }

  test("edges keeps only pairs sharing >= 2 orders, canonically ordered") {
    val e = Copurchase.edges(spark, sf)
    assert(e.filter(col("pa") >= col("pb")).count() === 0L)
    val viaCounts = Copurchase.pairCounts(spark, sf)
      .filter(col("w") >= 2).select("pa", "pb")
    assert(e.except(viaCounts).count() === 0L)
    assert(viaCounts.except(e).count() === 0L)
  }
}
