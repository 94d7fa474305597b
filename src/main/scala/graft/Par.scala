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
    // would EXECUTE upstream shuffle stages if any existed — so frames
    // that already contain a shuffle-inducing operator are returned
    // untouched (they are post-exchange and already parallel; spreading
    // them is pointless anyway). The probe only ever runs on
    // scan/filter/project-shaped inputs, where planning is cheap and the
    // file listing is shared with the real query via the session's
    // relation cache.
    import org.apache.spark.sql.catalyst.plans.logical._
    val shuffled = df.queryExecution.logical.collectFirst {
      case _: Aggregate => (); case _: Join => (); case _: Window => ()
      case _: Distinct => (); case _: Sort => ()
      case _: RepartitionOperation => ()
    }.nonEmpty
    if (shuffled) df
    else {
      val target = df.sparkSession.conf
        .get("spark.sql.shuffle.partitions", "32").toInt
      if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
    }
  }
}
