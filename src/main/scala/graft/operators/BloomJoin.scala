package graft.operators

import graft.plans.BloomMightContain
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Bloom-pruned semi join — the big-fact ⋈ medium-dim pattern where the
  * dimension is too large to broadcast as a hash relation but its KEY SET
  * compresses into a few-MB Bloom filter.
  *
  * Shape: build the filter with one distributed aggregation over the dim
  * keys (`stat.bloomFilter` — partial sketches merge map-side, only
  * fixed-size bitmaps reach the driver), broadcast it, drop non-matching
  * fact rows AT THE SCAN (before the join shuffle), then run the exact
  * semi join on the survivors to remove the fpp-bounded false positives.
  *
  * Why it matters at 100 TB: a selective dim (say 1% of customers) with a
  * sort-merge join shuffles the ENTIRE fact table first and discards 99%
  * of it after the merge. The bloom prunes that 99% before the exchange,
  * so the shuffle — the cluster's scarcest resource — carries only
  * ~1%·(1+fpp) of the fact rows. This is Spark's own runtime-filter idea
  * (InjectRuntimeFilter) made explicit, available when the optimizer's
  * size heuristics decline to fire, and composable with any downstream
  * plan. Results are EXACTLY the plain semi join's (no false negatives +
  * exact re-verify), which is what the oracle checks.
  */
object BloomJoin {

  /** Keep fact rows whose `factKey` appears in `dim`'s `dimKey` set.
    * `expectedKeys` sizes the filter (overestimates cost bits, not
    * correctness); `fpp` bounds the wasted post-prune shuffle share.
    */
  def prunedSemiJoin(fact: DataFrame, factKey: String,
                     dim: DataFrame, dimKey: String,
                     expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedKeys, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    fact
      .filter(BloomMightContain.mightContain(col(factKey), bc))
      .join(dim.select(col(dimKey)), col(factKey) === col(dimKey), "left_semi")
  }
}
