package graft.queries

import graft.{Scratch, Tables}
import graft.operators.TextDedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared co-purchase pair derivation: parts bought together in one
  * order, with the number of shared orders per pair.
  *
  * Three queries consume this exact artifact — `mb_copurchase` (top pairs
  * by count), `pr_copurchase` (PageRank over ≥2-order edges) and
  * `gr_triangles` (triangle counts over the same edges) — and the basket
  * expansion behind it is the most expensive text-free shuffle in the
  * suite (29-47 s at sf10). So it is computed ONCE per (session, sfDir),
  * staged to cluster-safe scratch, and every consumer reads the staged
  * parquet; a suite run pays the shuffle once instead of three times.
  *
  * Shuffle shape (why this beats the naive self-join): group lineitem to
  * per-order sorted baskets — one shuffle of (orderkey, partkey) — then
  * expand i<j pairs inside the array. Basket size is bounded by order
  * size (≤7 lines in TPC-H), so the expansion is ≤ C(7,2) rows per
  * order, linear in the fact table; the self-join alternative shuffles
  * the fact table twice and is quadratic on big orders. The sorted pair
  * is packed into ONE long (a<<32 | b, exact for part keys < 2^32), so
  * the count shuffle keys on an 8-byte primitive, and the hash agg runs
  * on long equality rather than struct comparison.
  *
  * Staged reads also give the consumers file-size statistics: the degree
  * and closing-edge joins downstream plan from real sizes instead of
  * worst-case aggregate estimates.
  */
object Copurchase {

  /** All co-purchase pairs as `(pa, pb, w)` with `pa < pb` and `w` = the
    * number of distinct orders containing both parts. Staged once per
    * (session, sfDir) via `Scratch.stagedFrame`, which memoizes the
    * scratch PATH under weak session keys — a DataFrame-valued memo here
    * would strongly reference the session from the value and pin stopped
    * sessions for the process lifetime. The key carries the sfDir digest
    * (md5, not `String.hashCode` — see `Scratch.digest`) because one
    * session reading two SFs (AnalyzesSpec) must stage two distinct
    * artifacts.
    */
  def pairCounts(s: SparkSession, d: String): DataFrame =
    Scratch.stagedFrame(s, "graft_copairs_" + Scratch.digest(d)) {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"))
        .groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
        .filter(size(col("parts")) > 1)
        .select(explode(TextDedup.expandSortedPairs(col("parts"),
          (x, y) => shiftleft(x, 32).bitwiseOR(y))).as("pk"))
        .groupBy("pk")
        .agg(count(lit(1)).as("w"))
        .select(shiftrightunsigned(col("pk"), 32).as("pa"),
          col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("pb"),
          col("w"))
    }

  /** Canonical (pa < pb) co-purchase edges: pairs sharing ≥ 2 orders —
    * the graph both PageRank and triangle counting run on.
    */
  def edges(s: SparkSession, d: String): DataFrame =
    pairCounts(s, d).filter(col("w") >= 2).select("pa", "pb")
}
