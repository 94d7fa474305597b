package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed temporal range join: left rows to right rows of the same key
  * with |left.ts − right.ts| ≤ window.
  *
  * Spark has no native range join; the naive formulation — equi-join on
  * the key, then filter on the time predicate — materializes a per-key
  * cartesian first, which detonates on hot keys (a bot user with 10⁶
  * events is 10¹² intermediate rows). The scale-correct shape bucketizes
  * time into window-sized bins: a right row in bin b can only match left
  * rows in bins {b−1, b, b+1}, so exploding the LEFT side into its three
  * candidate bins turns the range join into an equi-join on (key, bin)
  * plus an exact residual filter. Amplification is a fixed 3× of the
  * left side — independent of key skew — and each (left, right) match
  * meets exactly once (the right row's own bin), so no dedup is needed.
  */
object RangeJoin {

  /** Inner range join on `key` with `|lts − rts| ≤ windowSec`. Caller
    * guarantees disjoint column names between the two sides (rename
    * before joining). Comparison is in exact microseconds — the same
    * precision DuckDB applies to interval predicates.
    */
  def innerWithin(left: DataFrame, right: DataFrame, key: String,
                  lts: String, rts: String, windowSec: Long): DataFrame = {
    val wMicros = windowSec * 1000000L
    val lbin = floor(unix_micros(col(lts)) / wMicros)
    // the bin column deliberately carries RewriteBoundedIntervalJoin's
    // reserved name: the residual abs-filter below gets pushed into the
    // join condition by Catalyst, and without this marker the (session-
    // wired) optimizer rule would see a rewritable band there and stack a
    // SECOND bin explosion on the already-bucketized join
    val bin = "__graft_bin_l"
    val l = left.withColumn(bin, explode(array(lbin - 1, lbin, lbin + 1)))
    val r = right.withColumn(bin, floor(unix_micros(col(rts)) / wMicros))
    l.join(r, Seq(key, bin))
      .filter(abs(unix_micros(col(lts)) - unix_micros(col(rts))) <= wMicros)
      .drop(bin)
  }
}
