package graft.plans

import graft.SparkSuite

/** Plan-shape regression guards: the properties that make these queries
  * scale are physical-plan facts (pushdown, broadcast, partial agg, top-k
  * physicalization, codegen), not result facts — assert them so a future
  * refactor can't silently trade a broadcast for a sort-merge or lose a
  * pushed filter. String-level checks over the executed plan are
  * intentionally coarse: they survive Spark version drift better than
  * node-class assertions.
  */
class PlanShapeSpec extends SparkSuite {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("vocab_merges broadcasts the vocabulary-sized unigram table") {
    val p = plan("vocab_merges")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("ds_interleave joins its quota table by broadcast and physicalizes " +
    "the final order cheaply") {
    val p = plan("ds_interleave")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("txt_quality_gate reads only the columns it needs (source/text; " +
    "never the wide row)") {
    val p = plan("txt_quality_gate")
    val readSchemas = "ReadSchema: [^\\n]*".r.findAllIn(p).toList
    assert(readSchemas.nonEmpty, p)
    // the gate needs doc_id + text only — lang/source/n_chars must prune
    assert(readSchemas.forall(!_.contains("source")), readSchemas.mkString("\n"))
  }

  test("a12_mad_outliers broadcasts the 5-row per-group stats back " +
    "(no fact-table re-shuffle per pass)") {
    val p = plan("a12_mad_outliers")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("rank-filter dedups physicalize WindowGroupLimit (per-key heap " +
    "prune before the window sort — Spark's native top-k-per-key path)") {
    // this is why the repo has NO custom top-k physical operator: the
    // built-in InferWindowGroupLimit already inserts map- AND reduce-side
    // bounded per-group heaps ahead of the window sort, which beats a
    // reduce-only custom node. The lock guards the rank-filter shape
    // these queries rely on (an `rn <= k` written any other way — e.g.
    // through a non-literal bound — silently loses the optimization).
    for (q <- Seq("dd_keep_best", "d1_latest_wins", "txt_dtm"))
      assert(plan(q).contains("WindowGroupLimit"), q)
  }

  test("s4: predicate and projection are pushed into the parquet scan") {
    val p = plan("s4_scan_pushdown")
    assert(p.contains("PushedFilters: ["), p)
    assert(!p.contains("PushedFilters: []"), p)
  }

  test("j4 star join broadcasts the dimension side") {
    val p = plan("j4_star_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("tpch_q3 keeps broadcast joins (no sort-merge at dim scale)") {
    val p = plan("tpch_q3")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("top-k queries physicalize as TakeOrderedAndProject, not global sort") {
    assert(plan("o2_topk").contains("TakeOrderedAndProject"), "o2_topk")
    assert(plan("vocab_topk").contains("TakeOrderedAndProject"), "vocab_topk")
  }

  test("vocab_topk aggregates partially before the shuffle (map-side combine)") {
    val p = plan("vocab_topk")
    // partial + final HashAggregate pair around one exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("ds_sample scan prunes to the projected columns (text never read)") {
    val p = plan("ds_sample")
    val readSchemas = "ReadSchema: [^\\n]*".r.findAllIn(p).toList
    assert(readSchemas.nonEmpty, p)
    assert(readSchemas.forall(!_.contains("text")), readSchemas.mkString("\n"))
  }

  test("qr_report scans each table exactly once (3 scans total)") {
    val p = plan("qr_report")
    assert("Scan parquet".r.findAllIn(p).size == 3, p)
  }

  test("ev_items never re-runs from_json inside a Filter (InferFiltersFromGenerate)") {
    // plain explode makes the optimizer infer size(from_json(...))>0 and
    // push it into the scan stage — re-parsing every row twice more
    // (measured 3x the query cost); explode_outer keeps the parse out of
    // every Filter. Guard the property, not the mechanism.
    val p = plan("ev_items")
    val filters = "Filter [^\\n]*".r.findAllIn(p).toList
    assert(filters.forall(!_.contains("from_json")), filters.mkString("\n"))
  }

  test("fx_revenue broadcasts the rates dimension") {
    val p = plan("fx_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("ev_range_join is an equi-join on (key, bin), not a cartesian") {
    val p = plan("ev_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ds_split scan prunes to the projected columns (text never read)") {
    val p = plan("ds_split")
    val readSchemas = "ReadSchema: [^\\n]*".r.findAllIn(p).toList
    assert(readSchemas.nonEmpty && readSchemas.forall(!_.contains("text")),
      readSchemas.mkString("\n"))
  }

  test("tpch_q10 top-20 physicalizes as TakeOrderedAndProject; q19 broadcasts part") {
    assert(plan("tpch_q10").contains("TakeOrderedAndProject"), "q10")
    assert(plan("tpch_q19").contains("BroadcastHashJoin"), "q19")
  }

  test("GraftExtensions is live in the production session: naive SQL interval join is rescued") {
    // no extraOptimizations here — this session is built exactly like
    // Verify/Bench (spark.sql.extensions=graft.plans.GraftExtensions), so
    // a user typing the natural SQL must get the bucketized rewrite
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1") // force big-big: broadcastable sides skip the rule
    try {
      spark.range(0, 100).selectExpr("id % 5 AS k",
        "timestamp_micros(id * 1000000) AS lts").createOrReplaceTempView("g_l")
      spark.range(0, 100).selectExpr("id % 5 AS k2",
        "timestamp_micros(id * 900000) AS rts").createOrReplaceTempView("g_r")
      val df = spark.sql(
        "SELECT * FROM g_l JOIN g_r ON k = k2 AND abs(lts - rts) <= INTERVAL 3 SECONDS")
      assert(df.queryExecution.optimizedPlan.toString.contains("__graft_bin"),
        df.queryExecution.optimizedPlan.toString)
    } finally spark.conf.set(key, prev)
  }

  test("GraftExtensions is live in the production session: dot_f resolves in plain SQL") {
    val got = spark.sql(
      "SELECT dot_f(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").collect()(0).getDouble(0)
    assert(got == 11.0)
  }

  test("dot_l (integer sibling) resolves in plain SQL too") {
    val got = spark.sql(
      "SELECT dot_l(array(1L, 2L), array(3L, 4L)) AS d").collect()(0).getLong(0)
    assert(got == 11L)
  }

  test("tpch_q21 reads lineitem once — the EXISTS/NOT-EXISTS pair must not become self-joins") {
    val p = plan("tpch_q21")
    val liScans = "Scan parquet[^\\n]*".r.findAllIn(p).count(_.contains("lineitem"))
    assert(liScans == 1, p)
  }

  test("tpch_q8/q9 resolve every dimension via broadcast (fact shuffles only on natural keys)") {
    assert("BroadcastHashJoin".r.findAllIn(plan("tpch_q8")).size >= 3, "q8")
    assert("BroadcastHashJoin".r.findAllIn(plan("tpch_q9")).size >= 2, "q9")
  }

  test("tpch_q2/q11 correlated scalars stay off the cartesian path") {
    // q11's crossJoin is a broadcast of ONE scalar row; q2's min resolves
    // via equi-join on the aggregated frame — neither may physicalize as
    // an unbounded cartesian
    assert(!plan("tpch_q2").contains("CartesianProduct"), "q2")
    assert(!plan("tpch_q11").contains("CartesianProduct"), "q11")
  }

  test("cust_pareto's window runs over the TakeOrdered top-100, never the customer population") {
    val p = plan("cust_pareto")
    assert(p.contains("TakeOrderedAndProject"), p)
    // the global-order window must sit ABOVE the top-k cut: with the cut
    // in place the single-partition window sees exactly 100 rows
    assert(p.indexOf("Window") < p.indexOf("TakeOrderedAndProject"), p)
  }

  test("dd_incremental joins the band index by equi-join, never cartesian") {
    // the whole at-scale contract is that batch→index matching is a hash
    // join on (band, band_hash): a cartesian/BNL here would be O(batch ×
    // corpus) and defeat the index entirely
    val p = plan("dd_incremental")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p) // scalar max-id crossjoin is BNL-1-row
  }

  test("ds_temperature broadcasts its quota table like ds_interleave") {
    val p = plan("ds_temperature")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("txt_nb_quality: the two-row prior table is broadcast, not shuffled") {
    val p = plan("txt_nb_quality")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("gr_triangles joins degrees by broadcast at test scale — chosen by " +
    "the planner, never hint-forced (deg grows with the data)") {
    val q = graft.SparkEntry.queries("gr_triangles")(spark, sf)
    val p = q.queryExecution.executedPlan.toString
    // at sf0.001 the staged-edge stats make deg tiny → planner broadcasts
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the scale guard: no broadcast() hint anywhere in the logical plan —
    // a forced broadcast of the data-proportional deg table would OOM the
    // driver at 100 TB. ResolvedHint survives analysis; its absence means
    // the physical broadcast above came from size stats, not a hint.
    val analyzed = q.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"), analyzed)
  }

  test("mb_copurchase reads the shared staged pair counts — no basket " +
    "re-expansion in its own plan") {
    // the C(basket,2) explode + count shuffle lives in Copurchase's
    // staging job, paid once per (session, dir); this query's plan must
    // be a staged-parquet scan + top-k, nothing more
    val p = plan("mb_copurchase")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Generate"), p)
    assert(!p.contains("collect_set"), p)
  }

  test("emb_kmeans broadcasts the k-centroid side every iteration") {
    // the corpus×centroids pass must be a broadcast nested loop over k=8
    // rows, never a cartesian shuffle of the corpus
    val p = plan("emb_kmeans")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("sk_kmv builds sketches as TakeOrdered partials, not global sorts") {
    val p = plan("sk_kmv")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("scan-heavy relational aggregates run inside whole-stage codegen") {
    // AQE only annotates codegen stages once THIS plan is final — collect
    // the frame itself (df.count() would execute a different plan)
    val df = graft.SparkEntry.queries("tpch_q1")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), p) // codegen stage markers
  }

  test("ev_path_topk physicalizes the global top-20 as a TakeOrdered heap, " +
    "never a full sort of the path table") {
    assert(plan("ev_path_topk").contains("TakeOrderedAndProject"),
      plan("ev_path_topk"))
  }

  test("tok_coverage: the vocab cut is a TakeOrdered heap and the coverage " +
    "join broadcasts the K-row vocab") {
    val p = plan("tok_coverage")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("blocked pair generators (er_name_match, dd_containment) never " +
    "physicalize a cartesian or nested-loop join") {
    for (q <- Seq("er_name_match", "dd_containment")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q\n$p")
    }
  }

  test("sk_kmv_merge: merged and direct sketches are TakeOrdered heaps over " +
    "k-row partials, never global sorts") {
    val p = plan("sk_kmv_merge")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ev_overlap: the leaderboard cut is a TakeOrdered heap over staged " +
    "artifacts; no cartesian beyond the broadcast 1-row threshold") {
    val p = plan("ev_overlap")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("graft_ovl_"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("incremental folds read their state from staged parquet, not lineage") {
    // the whole point of a14/scd2_merge is that history is NOT recomputed:
    // the executed plan must contain a scan of the scratch state file. A
    // refactor that silently re-derived state from the fact table would
    // keep the oracle green while destroying the 100 TB story.
    val a14 = plan("a14_incremental_agg")
    assert(a14.contains("graft_a14_"), a14)
    val scd2 = plan("scd2_merge")
    assert(scd2.contains("graft_scd2_"), scd2)
    assert(!scd2.contains("CartesianProduct"), scd2)
  }

  test("content-addressed queries keep heavy predicates ABOVE the collapse " +
    "(pushdown fence present; no lambda work in the corpus-side scan filter)") {
    // without Content.pushdownFence a content-pure filter (quality gate,
    // size(tokens) >= k) is a predicate over the collapse aggregate's
    // grouping columns and Catalyst pushes it below — the heavy expression
    // silently runs per DOCUMENT again (measured 4.9 s vs 0.4 s on the
    // pipe_curate gate at 100×). The fence is a CollectMetrics node; the
    // corpus-side filter, if any, must stay lambda-free.
    for (q <- Seq("pipe_curate", "txt_self_span", "txt_self_clean")) {
      val p = plan(q)
      assert(p.contains("CollectMetrics"), s"$q: fence missing\n$p")
      // a pushed-down filter is the PARENT of a parquet scan (nearest line
      // above with shallower tree indentation); the legitimate gate filter
      // above the fence also mentions lambdas, so position is the signal
      val lines = p.linesIterator.toVector
      def indent(l: String): Int = l.takeWhile(c => " :+-".contains(c)).length
      val scanParents = lines.zipWithIndex
        .filter(_._1.contains("Scan parquet"))
        .flatMap { case (l, i) =>
          (i - 1 to 0 by -1).find(j => indent(lines(j)) < indent(l)).map(lines)
        }
      val bad = scanParents.filter(l =>
        l.contains("lambdafunction") || l.contains("aggregate("))
      assert(bad.isEmpty, s"$q: heavy filter pushed to corpus side:\n" +
        bad.mkString("\n"))
    }
  }

  test("pipe_rag: queries broadcast (corpus never shuffles for retrieval), " +
    "top-8 physicalizes as WindowGroupLimit, docs join by broadcast") {
    val p = plan("pipe_rag")
    assert(p.contains("BroadcastNestedLoopJoin BuildRight"), p)
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("ds_shuffle: one hash exchange on shard, doc_id-only scan, no " +
    "global single-partition window") {
    val p = plan("ds_shuffle")
    assert("Exchange hashpartitioning\\(shard".r.findAllIn(p).size == 1, p)
    assert(!p.contains("SinglePartition"), p)
    val readSchemas = "ReadSchema: [^\\n]*".r.findAllIn(p).toList
    assert(readSchemas.forall(r => !r.contains("text")),
      s"shuffle key must not drag the text column:\n$readSchemas")
  }

  test("sim_pq: codebook and distance-table joins are broadcast over the " +
    "staged cells — never a corpus-side sort-merge or cartesian") {
    val p = plan("sim_pq")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("txt_bpe_encode: the vocabulary encoding joins by broadcast; the " +
    "corpus pass is content-collapsed (one aggregate over the scan)") {
    val p = plan("txt_bpe_encode")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("pipe_shards: gate runs behind the collapse fence, one shard " +
    "exchange, no sort-merge join") {
    val p = plan("pipe_shards")
    assert(p.contains("CollectMetrics"), p)
    assert("Exchange hashpartitioning\\(shard".r.findAllIn(p).size == 1, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("sim_pq_rerank: shortlist+query vectors broadcast against the " +
    "corpus-side quantized vectors — never a corpus sort-merge/cartesian") {
    val p = plan("sim_pq_rerank")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sim_ivfpq: probe joins the codes on (cid, m, code) by broadcast — " +
    "the join key IS the inverted-list prune; no corpus-side sort-merge") {
    val p = plan("sim_ivfpq")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sim_ivfpq: the cid-partitioned codes SCAN carries a dynamic " +
    "partition-pruning filter (structural half of the prune contract)") {
    // the codes artifact is staged partitionBy(cid); the probe's broadcast
    // equi-join on cid must reach the scan as a PartitionFilters
    // dynamicpruningexpression. This locks INSERTION; whether the filter
    // fires is Spark's pruningHasBenefit cost call (correctly "no" on a
    // toy artifact, "yes" at production sizes) — the behavioral half is
    // certified by IvfConfSpec's scan-metrics test, which forces the
    // at-scale verdict and asserts numFiles == probed cells.
    val p = plan("sim_ivfpq")
    assert(p.contains("dynamicpruningexpression"), p)
    assert(p.contains("PartitionFilters"), p)
  }

  test("pipe_rag_hybrid: postings join the broadcast query side; no " +
    "cartesian product anywhere (the one crossJoin is a 1-row scalar)") {
    val p = plan("pipe_rag_hybrid")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
