package graft.queries

import graft.{Memo, Scratch, Tables}
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

  // memoized per (session, sfDir) like Tables.load — weak session keys so
  // stopped sessions (and their staged frames) are collectable; the
  // scratch files themselves are cleaned by Scratch's shutdown hook
  private val memo = new java.util.WeakHashMap[
    SparkSession, java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  /** All co-purchase pairs as `(pa, pb, w)` with `pa < pb` and `w` = the
    * number of distinct orders containing both parts. Staged once per
    * (session, sfDir); callers get a parquet-backed frame.
    */
  def pairCounts(s: SparkSession, d: String): DataFrame = {
    val perSession = memo.synchronized {
      var m = memo.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        memo.put(s, m)
      }
      m
    }
    Memo.getOrPut(perSession, d) {
      // dirFor (not dir): benchmark min-of-N reruns in a fresh session
      // overwrite one directory instead of accreting copies. The key
      // carries the sfDir: one session reading two SFs (AnalyzesSpec)
      // must stage two distinct artifacts. md5 of the full path, not
      // String.hashCode: a 32-bit collision between two sfDirs would
      // silently cross-wire their staged pair counts (the Memo key is
      // the full path, so the first dir's memoized frame would read the
      // second dir's overwrite).
      val path = Scratch.dirFor(s, "graft_copairs_" +
        java.security.MessageDigest.getInstance("MD5")
          .digest(d.getBytes("UTF-8")).take(8)
          .map("%02x".format(_)).mkString) + "/pairs"
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
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path)
    }
  }

  /** Canonical (pa < pb) co-purchase edges: pairs sharing ≥ 2 orders —
    * the graph both PageRank and triangle counting run on.
    */
  def edges(s: SparkSession, d: String): DataFrame =
    pairCounts(s, d).filter(col("w") >= 2).select("pa", "pb")
}
