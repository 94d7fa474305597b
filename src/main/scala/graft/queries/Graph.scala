package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over derived relationship graphs — here PageRank on
  * the co-purchase graph (parts are nodes, "bought together in ≥ 2
  * orders" are edges).
  *
  * Exactness doctrine: the whole iteration runs in INTEGER micro-units
  * (pr starts at 10⁶, contribution is `pr div deg`, damping is
  * `150000 + (85·Σ) div 100`), so the fixpoint trajectory is
  * bit-identical in any engine — float PageRank would diverge in the
  * last ulp because neighbor sums are order-dependent, and long sums are
  * not. The truncation remainder (< deg micros per node per round) is
  * deliberately dropped, identically everywhere.
  *
  * Scale design: the edge list is staged ONCE to cluster-safe scratch
  * (the basket expansion is the expensive part — one shuffle,
  * C(basket,2)-bounded, same shape as `mb_copurchase`); each of the
  * fixed 10 rounds is one join + one groupBy on the edge list, per-node
  * state is (deg, pr) — two longs, no neighbor arrays, so hot nodes cost
  * one counter. The state plan is checkpointed every `CkptEvery` rounds:
  * each round references the previous state once (linear growth), so a
  * light cadence bounds analysis cost without paying a write barrier per
  * round (measured: per-round staging of small frames costs more than it
  * saves — see TextDedup's freq note).
  *
  * Negative result, measured at the 100× SF: staging the symmetric edge
  * list as a 32-bucket table on `src` (degree folded in) so the ten
  * rank⋈edge joins never exchange the edge side LOSES 13% (36.6 s →
  * 41.4 s isolated min-of-3). Within one action ReusedExchange already
  * dedupes the identical edge exchange (~2-3 paid per run with the
  * checkpoint cadence, not 10), while bucketing adds a full extra
  * materialization of 2×|edges| rows plus catalog overhead. Bucketed
  * layouts win on CROSS-query reuse (s11), not in-query loops; the
  * plain parquet staging stays.
  */
object Graph {

  type Q = (SparkSession, String) => DataFrame

  private val Iters = 10
  private val CkptEvery = 5

  def prCopurchase(s: SparkSession, d: String): DataFrame = {
    val scratch = graft.Scratch.dir(s, "graft_pr_")
    // undirected co-purchase edges (≥ 2 shared orders) from the shared
    // staged derivation — see Copurchase for the shuffle-shape rationale
    val e = Copurchase.edges(s, d)
    val sym = e.select(col("pa").as("src"), col("pb").as("dst"))
      .unionByName(e.select(col("pb").as("src"), col("pa").as("dst")))
    // deg staged once: it is re-read by EVERY materialization (each
    // checkpoint plus the final action replays the rounds since the last
    // barrier, and each round references deg) — the cross-ACTION reuse
    // case where a small staged file beats recompute (exchange reuse
    // only dedupes within one action; see the write-barrier memo in
    // TextDedup.ngramJaccardPairs for the opposite verdict in-action)
    val degPath = scratch + "/deg"
    val deg = graft.Scratch.writeRead(
      sym.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg")), degPath)

    var state = deg.withColumn("pr", lit(1000000L))
    for (i <- 1 to Iters) {
      val contrib = state
        .join(sym, state("node") === sym("src"))
        .select(col("dst").as("node"), expr("pr div deg").as("c"))
      val sums = contrib.groupBy("node").agg(sum("c").as("sc"))
      state = deg.join(sums, Seq("node"), "left")
        .select(col("node"), col("deg"),
          (lit(150000L) + expr("85 * coalesce(sc, 0L) div 100")).as("pr"))
      if (i % CkptEvery == 0 && i < Iters) {
        state = graft.Scratch.writeRead(state, s"$scratch/state_$i")
      }
    }
    state
      .select(col("node").as("part"), col("deg"), col("pr"))
      .orderBy(desc("pr"), col("part"))
      .limit(20)
  }

  // the oracle unrolls the fixed iteration count as chained CTEs —
  // recursive-CTE aggregation over the working table is not portable,
  // and an unrolled chain is mechanically identical to the Spark loop
  val prCopurchaseSql: String = {
    val rounds = (1 to Iters).map { i =>
      s"""p$i AS (
         |  SELECT d.node, d.deg,
         |         150000 + (85 * COALESCE(s.sc, 0)) // 100 AS pr
         |  FROM deg d LEFT JOIN (
         |    SELECT e.dst AS node, CAST(SUM(p.pr // p.deg) AS BIGINT) AS sc
         |    FROM p${i - 1} p JOIN sym e ON p.node = e.src GROUP BY 1
         |  ) s ON d.node = s.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |e0 AS (
       |  SELECT a.l_partkey AS pa, c.l_partkey AS pb
       |  FROM b a JOIN b c
       |    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
       |  GROUP BY 1, 2 HAVING count(*) >= 2
       |),
       |sym AS (SELECT pa AS src, pb AS dst FROM e0
       |        UNION ALL SELECT pb, pa FROM e0),
       |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
       |        FROM sym GROUP BY 1),
       |p0 AS (SELECT node, deg, CAST(1000000 AS BIGINT) AS pr FROM deg),
       |$rounds
       |SELECT node AS part, deg, CAST(pr AS BIGINT) AS pr
       |FROM p$Iters ORDER BY pr DESC, part LIMIT 20""".stripMargin
  }

  // ---- GR: degree-ordered triangle counting ----
  // Triangles in the co-purchase graph (same "bought together in ≥2
  // orders" edges as PageRank). The naive count joins the edge list with
  // itself on a shared endpoint and probes the closing edge — on a graph
  // with hubs the wedge set is Σ deg(v)², quadratic in the hottest
  // degree. The degree-ordering trick (compact-forward): orient every
  // edge from its lower-(deg,id) endpoint to its higher one, and only
  // pair OUT-neighbors. Every triangle is then generated exactly once —
  // at its minimum-(deg,id) corner — and the per-node wedge work is
  // out-deg², which orientation bounds by O(√m) amortized: a hub's edges
  // almost all point INTO it, so the hub generates no wedges. That is the
  // difference between "falls over on the first celebrity node" and
  // "survives 100 TB of power-law edges".
  //
  // Exactness: the triangle SET is independent of counting strategy, so
  // the oracle uses the simple id-ordered 3-join — identical corners,
  // identical per-part counts.
  def grTriangles(s: SparkSession, d: String): DataFrame =
    // canonical (pa < pb, ≥2 shared orders) edges from the shared staged
    // derivation (Copurchase) — parquet-backed, so the three joins below
    // re-read files, not a recomputed shuffle
    trianglesPerNode(Copurchase.edges(s, d))
      .orderBy(desc("triangles"), col("part"))
      .limit(10)

  /** Per-node triangle counts over a canonical (pa < pb) edge list —
    * the degree-ordered core, factored out so specs can drive it with
    * constructed graphs (hubs, cliques) independent of the co-purchase
    * derivation.
    */
  def trianglesPerNode(e: DataFrame): DataFrame = {
    val deg = e.select(col("pa").as("node"))
      .unionByName(e.select(col("pb").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // total order (deg, id) packed into one long: deg<<32 | id — part
    // keys are < 2^32 and degrees < 2^31, so the pack is order-preserving
    // and the wedge inequality below compares one primitive
    def key(dg: org.apache.spark.sql.Column, id: org.apache.spark.sql.Column) =
      shiftleft(dg, 32).bitwiseOR(id)
    val da = deg.select(col("node").as("pa"), col("deg").as("dega"))
    val db = deg.select(col("node").as("pb"), col("deg").as("degb"))
    // deg has one row per distinct part — a set that grows with the data,
    // so the joins are deliberately NOT hint-forced: a forced broadcast is
    // fine at sf10 (~2M parts) and fatal at 100 TB (billions). The planner
    // (static stats off the staged parquet, or AQE at runtime) broadcasts
    // while deg fits and degrades to shuffle joins when it doesn't.
    val keyed = e.join(da, "pa").join(db, "pb")
      .select(col("pa"), col("pb"),
        key(col("dega"), col("pa")).as("ka"), key(col("degb"), col("pb")).as("kb"))
    val o = keyed.select(
      when(col("ka") < col("kb"), col("pa")).otherwise(col("pb")).as("u"),
      when(col("ka") < col("kb"), col("pb")).otherwise(col("pa")).as("v"),
      greatest(col("ka"), col("kb")).as("kv"))

    // wedges at the min corner: out-neighbor pairs ordered by (deg,id);
    // the closing probe is a semi-ish inner join back on the oriented
    // edge (v1,v2) — kv(v1) < kv(v2) guarantees orientation matches
    val w1 = o.select(col("u"), col("v").as("v1"), col("kv").as("k1"))
    val w2 = o.select(col("u"), col("v").as("v2"), col("kv").as("k2"))
    val wedges = w1.join(w2, "u").filter(col("k1") < col("k2"))
    val closing = o.select(col("u").as("v1"), col("v").as("v2"))
    val tris = wedges.join(closing, Seq("v1", "v2"))
      .select(col("u"), col("v1"), col("v2"))

    // per-part participation: each triangle credits all three corners
    tris.select(explode(array(col("u"), col("v1"), col("v2"))).as("part"))
      .groupBy("part").agg(count(lit(1)).as("triangles"))
  }

  val grTrianglesSql: String =
    """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e AS (
      |  SELECT a.l_partkey AS pa, c.l_partkey AS pb
      |  FROM b a JOIN b c
      |    ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2
      |),
      |t AS (
      |  SELECT e1.pa AS a, e1.pb AS x, e2.pb AS c
      |  FROM e e1
      |  JOIN e e2 ON e1.pb = e2.pa
      |  JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
      |),
      |corners AS (
      |  SELECT a AS part FROM t
      |  UNION ALL SELECT x FROM t
      |  UNION ALL SELECT c FROM t
      |)
      |SELECT part, CAST(count(*) AS BIGINT) AS triangles
      |FROM corners GROUP BY 1
      |ORDER BY triangles DESC, part LIMIT 10""".stripMargin

  val queries: Map[String, Q] = Map(
    "pr_copurchase" -> (prCopurchase _),
    "gr_triangles" -> (grTriangles _))

  val oracles: Map[String, String] = Map(
    "pr_copurchase" -> prCopurchaseSql,
    "gr_triangles" -> grTrianglesSql)
}
