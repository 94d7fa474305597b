package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for corpus subsetting.
  *
  * The stratified variant is the skew-safe formulation: a naive
  * `row_number() OVER (PARTITION BY stratum ORDER BY hash)` sorts each
  * stratum's ENTIRE row set in one task — at 100 TB with an 80 %-English
  * corpus that is a single-task sort of most of the data. Here a
  * per-stratum hash threshold prunes each stratum to an expected
  * `overSample × k` survivors BEFORE the window, so the per-stratum sort
  * is O(overSample × k) regardless of stratum size. Keys are uniform hex
  * hashes, so "smallest k by key" is a uniform random-but-deterministic
  * sample, and any threshold that keeps ≥ k rows keeps a prefix of the
  * key order — the top-k under the threshold IS the global stratum top-k.
  */
object Sampling {

  /** Smallest-k rows per stratum ordered by (`hashKey`, `tie`), where
    * `hashKey` is a uniformly-distributed lowercase-hex string (e.g.
    * `md5(...)`) at least 8 chars long.
    *
    * Strata of ≤ `overSample × k` rows keep every row at the threshold
    * stage (keep-fraction clamps to 1.0) — exact by construction. Larger
    * strata keep an expected `overSample × k` rows; with the default 8×
    * oversample the odds of a stratum surviving with fewer than k rows
    * (which would shrink its sample) are a ≥ 8× Chernoff tail —
    * negligible, and deterministic for a given corpus either way.
    *
    * Plan shape: one tiny per-stratum count aggregate broadcast back, a
    * scan-side filter, then the window over the pruned rows. No full-
    * stratum sort anywhere.
    */
  /** Weighted Bernoulli (importance) sampling: keep each row with
    * probability `weightBp`/10000, deterministically — the training-data
    * curation move that biases a corpus subset toward high-quality
    * documents while staying reproducible run-over-run.
    *
    * Mechanics: the row is kept iff the first 8 hex chars of its
    * `hashKey` (uniform in [0, 2³²)) fall below
    * `floor(weightBp · 2³² / 10⁴)` formatted `%08x` and compared as hex
    * STRINGS — the same cross-engine-exact trick as [[stratifiedTopK]]
    * (the floor runs on identical IEEE doubles in every engine, so DuckDB
    * reproduces the exact keep set). Pure per-row projection: no
    * shuffle, no state, embarrassingly parallel at any scale.
    */
  def weightedBernoulli(df: DataFrame, weightBp: Column, hashKey: Column): DataFrame = {
    val thr = format_string("%08x",
      least(lit(4294967295L),
        floor(greatest(lit(0L), weightBp.cast("long")) * lit(4294967296.0)
          / lit(10000.0)).cast("long")))
    df.filter(substring(hashKey, 1, 8) < thr)
  }

  def stratifiedTopK(df: DataFrame, stratum: String, hashKey: Column,
                     tie: Seq[Column], k: Int, overSample: Int = 8): DataFrame = {
    val counts = df.groupBy(stratum).agg(count(lit(1)).as("smp_n"))
    // threshold on the first 8 hex chars (32 bits of key space):
    // floor(fraction × 2^32) formatted as %08x, capped at ffffffff —
    // floor (not cast) so DuckDB mirrors bit-for-bit (its double→int
    // cast rounds; Spark's truncates)
    val thr = format_string("%08x",
      least(lit(4294967295L),
        floor(least(lit(1.0), lit(overSample.toDouble * k) / col("smp_n"))
          * lit(4294967296.0)).cast("long")))
    val perStratum = broadcast(counts.select(col(stratum), thr.as("smp_thr")))
    val w = Window.partitionBy(stratum).orderBy(col("smp_key") +: tie: _*)
    df.withColumn("smp_key", hashKey)
      .join(perStratum, Seq(stratum))
      .filter(substring(col("smp_key"), 1, 8) <= col("smp_thr"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .drop("smp_key", "smp_thr")
  }
}
