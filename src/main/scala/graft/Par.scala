package graft

import org.apache.spark.sql.DataFrame

/** Parallelism spreading for hash-heavy projections. */
object Par {

  /** Repartition only when the input is narrower than the session's
    * shuffle parallelism. A single-file local scan arrives as 1-2
    * partitions, so per-row hash work (md5/minhash/simhash) would run on
    * one core without a spread; but a 100 TB scan already arrives as
    * thousands of splits, and an unconditional `repartition(n)` there is
    * a full shuffle of the corpus (and a *narrowing* to n partitions!)
    * for nothing. Conditioning on the actual scan width gives the local
    * win without the at-scale penalty.
    */
  def spread(df: DataFrame): DataFrame = {
    // the width probe (df.rdd) physically plans the frame, and under AQE
    // would EXECUTE upstream shuffle stages if any existed — so the probe
    // only runs when the plan is provably scan-shaped: every node must be
    // a Project/Filter/alias or a leaf relation. This is a WHITELIST, not
    // a denylist of shuffle operators: an unanticipated node (Deduplicate,
    // MapGroups, Intersect, ...) means "don't probe", never "safe" — a
    // blocked probe merely skips an optional repartition, a wrong probe
    // executes half the query eagerly on the driver. Plans that fail the
    // check are post-exchange and already parallel anyway.
    // a streaming frame has no .rdd at all — micro-batch planning sets
    // its parallelism, so spread is a no-op there by definition
    if (df.isStreaming) return df
    import org.apache.spark.sql.catalyst.plans.logical._
    val probeSafe = df.queryExecution.logical.collect { case n => n }.forall {
      case _: Project | _: Filter | _: SubqueryAlias => true
      case n => n.children.isEmpty // scan / local-relation leaves
    }
    if (!probeSafe) df
    else {
      val target = df.sparkSession.conf
        .get("spark.sql.shuffle.partitions", "32").toInt
      if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
    }
  }

  /** Globally-ordered spread for expensive projections that must emit
    * sorted output: range-partition on `key` with an EXPLICIT partition
    * count, then sort within partitions — globally ordered because range
    * partitions are themselves ordered. Two traps this dodges, both
    * measured at sf0.1:
    *  - a trailing `orderBy` after the projection re-executes the
    *    projection in the range exchange's sampling pass (2× the per-row
    *    work) — here the sampling only re-reads the cheap input;
    *  - a bare `orderBy` BEFORE the projection lets AQE coalesce the
    *    small exchange output to one partition (the sort's partition
    *    count is advisory), serializing the downstream per-row work
    *    (17 s single-core vs 0.9 s spread for txt_winnow); an explicit
    *    count is user-specified and AQE keeps it.
    * Ties across partition boundaries are the caller's concern — use a
    * unique key (doc_id) or accept boundary-adjacent tie order.
    */
  def sortSpread(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    df.repartitionByRange(n, key).sortWithinPartitions(key)
  }
}
