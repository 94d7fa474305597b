package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Structural contracts of the round-8 retrieval additions; the
  * value-level cross-engine check is the DuckDB oracle.
  */
class RerankHybridSpec extends SparkSuite {

  test("sim_pq_rerank: ranks 1..5, d2 nondecreasing, no self") {
    val r = SimilarityQueries.simPqRerank(spark, sf).cache()
    try {
      val perQuery = r.groupBy("query_id")
        .agg(count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
      assert(perQuery.filter(
        col("n") =!= 5 || col("lo") =!= 1 || col("hi") =!= 5).count() == 0)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy("rank")
      assert(r.withColumn("prev", lag("d2", 1).over(w))
        .filter(col("prev").isNotNull && col("d2") < col("prev"))
        .count() == 0, "exact d2 must be nondecreasing in rank")
      assert(r.filter(col("query_id") === col("neighbor_id")).count() == 0)
    } finally { r.unpersist(); () }
  }

  test("rerank recall dominates plain-ADC recall per query (provable invariant)") {
    // If a true top-5 neighbor t is in the ADC top-5 it is in the top-50
    // shortlist, and at most 4 shortlist members can have smaller exact
    // distance than t (they would be global top-5 themselves) — so exact
    // rerank keeps t. Hence per query: rerank hits >= ADC hits, always.
    val adc = SimilarityQueries.simPqRecall(spark, sf)
      .select(col("query_id"), col("n_hits").as("adc_hits"))
    val rr = SimilarityQueries.simRerankRecall(spark, sf)
      .select(col("query_id"), col("n_hits").as("rr_hits"))
    val joined = adc.join(rr, "query_id").cache()
    try {
      assert(joined.filter(col("rr_hits") < col("adc_hits")).count() == 0,
        "rerank recall must dominate ADC recall per query")
      val Seq(a, b) = joined.agg(sum("adc_hits"), sum("rr_hits"))
        .collect()(0).toSeq.map(_.asInstanceOf[Long])
      info(s"total hits/250: ADC=$a rerank=$b")
      // >= not >: dominance is the provable invariant; strict improvement
      // is the typical-corpus outcome but a regenerated dataset where ADC
      // already matches the rerank is a legal result of correct code
      assert(b >= a, "rerank recall must dominate ADC recall in total")
    } finally { joined.unpersist(); () }
  }

  test("rag_hybrid_recall: per-system decomposition is bounded and " +
    "internally consistent (the numbers themselves are oracle-certified)") {
    val r = SimilarityQueries.ragHybridRecall(spark, sf).cache()
    try {
      assert(r.filter(col("n_hits_lex") > 8 || col("n_hits_dense") > 8 ||
        col("n_hits_fused") > 8).count() == 0, "hits cannot exceed depth")
      assert(r.filter(col("recall_bp_fused") =!=
        col("n_hits_fused") * 1250).count() == 0)
      val Seq(l, dn, f) = r.agg(sum("n_hits_lex"), sum("n_hits_dense"),
        sum("n_hits_fused")).collect()(0).toSeq.map(_.asInstanceOf[Long])
      // Measured, not asserted: RRF dominance over the best single system
      // is NOT universal (Cormack 2009), and on this synthetic corpus the
      // decomposition shows it — lexical term overlap carries ~no signal
      // toward the dense-L2 truth, so fusing it in can EVICT true
      // neighbors from the fixed-depth fused list (sf0.01: lex 0, dense
      // 17, fused 15 of 80). That negative result is the point of
      // shipping the eval: you measure fusion before deploying it.
      info(s"hits@8 of 80: lex=$l dense=$dn fused=$f")
      // no cross-system inequality is asserted: fused can exceed l+dn
      // (a rank-9..20 candidate from either pool can enter the fused
      // top-8) and can trail max(l, dn) (eviction, as measured here)
      assert(l >= 0 && dn >= 0 && f >= 0)
    } finally { r.unpersist(); () }
  }

  test("pipe_rag_hybrid: bounded ranked lists, positive fused scores, no self") {
    val r = SimilarityQueries.pipeRagHybrid(spark, sf).cache()
    try {
      assert(r.filter(col("rrf") <= 0).count() == 0,
        "every fused candidate came from at least one system")
      val perQuery = r.groupBy("query_id")
        .agg(count(lit(1)).as("n"), min("rank").as("lo"),
          count_distinct(col("rank")).as("nr"))
      assert(perQuery.filter(
        col("n") > 8 || col("lo") =!= 1 || col("nr") =!= col("n")).count() == 0,
        "per query: dense ranks from 1, at most RagK rows")
      assert(r.filter(col("query_id") === col("doc_id")).count() == 0)
      // both systems contribute somewhere: at least one fused row must
      // exceed the single-system RRF maximum 1000000 div 61
      assert(r.filter(col("rrf") > 1000000L / 61).count() > 0,
        "no candidate was ranked by both systems — fusion is degenerate")
    } finally { r.unpersist(); () }
  }
}
