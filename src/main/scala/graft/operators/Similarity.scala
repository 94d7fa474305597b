package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate / exact nearest-neighbor search over an embedding column.
  *
  * Scale design: brute force is queries × corpus — fine when the query set
  * is small and broadcast (each corpus partition streams against the
  * broadcast queries; no shuffle of the corpus). For all-pairs at 100 TB,
  * use `lshTopK`: corpus is bucketed by a sign-bit LSH signature, the join
  * happens only within buckets (hash-partitioned by bucket id), cutting the
  * candidate space by ~2^nBits at some recall cost.
  */
object Similarity {

  /** Null-guarded cosine over the canonical (q_emb, q_norm, c_emb,
    * c_norm) pair columns — the one scoring rule every ANN variant
    * shares (zero-norm vectors score null and rank last).
    */
  private def cosineScore: org.apache.spark.sql.Column =
    when(col("q_norm") > 0 && col("c_norm") > 0,
      VectorFns.dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")))

  /** Shared tail of every ANN variant: rank scored candidate pairs per
    * query, keep top-k, emit the (query_id, rank, neighbor_id[, extra],
    * score) output contract with 4-decimal scores.
    */
  private def rankTopK(scored: DataFrame, k: Int,
                       extra: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(desc("score"), col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(Seq(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id")) ++ extra :+ round(col("score"), 4).as("score"): _*)
  }

  /** Exact top-k cosine neighbors for each query vector.
    * `queries`/`corpus`: (id, embedding). Output: (query_id, rank,
    * neighbor_id, score). Self-matches excluded.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // norms precomputed per side: O(n+q) norm folds instead of O(n*q);
    // numerically identical to computing them inside the pair loop
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      VectorFns.l2Norm(col("embedding")).as("q_norm"))
    val c = graft.Par.spread(corpus)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
        VectorFns.l2Norm(col("embedding")).as("c_norm"))
    rankTopK(c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", cosineScore), k)
  }

  /** IVF-style ANN: a deterministic representative per partition (the
    * min-id vector of each `label` — a rule-based medoid, so there is no
    * float averaging to disagree about), queries probe their nearest
    * representative by cosine, then search exactly within that one
    * partition. The 100 TB shape: partitions are co-located by label, the
    * representative table is tiny and broadcast, and each query touches
    * 1/nlist of the corpus.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("label").orderBy("vec_id")
    val reps = corpus
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("label").as("rep_label"), col("embedding").as("rep_emb"),
        VectorFns.l2Norm(col("embedding")).as("rep_norm"))
    // probe: nearest representative per query (broadcast reps both ways)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      VectorFns.l2Norm(col("embedding")).as("q_norm"))
    val probeW = Window.partitionBy("query_id")
      .orderBy(desc("rep_score"), col("rep_label"))
    val probed = q.crossJoin(broadcast(reps))
      .withColumn("rep_score",
        when(col("q_norm") > 0 && col("rep_norm") > 0,
          VectorFns.dot(col("q_emb"), col("rep_emb")) / (col("q_norm") * col("rep_norm"))))
      .withColumn("__pr", row_number().over(probeW)).filter(col("__pr") === 1)
      .select(col("query_id"), col("q_emb"), col("q_norm"),
        col("rep_label").as("probe_label"))
    // search only inside the probed partition
    val c = graft.Par.spread(corpus)
      .select(col("vec_id").as("neighbor_id"), col("label").as("probe_label"),
        col("embedding").as("c_emb"), VectorFns.l2Norm(col("embedding")).as("c_norm"))
    rankTopK(c.join(broadcast(probed), "probe_label")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", cosineScore), k,
      extra = Seq(col("probe_label").cast("long").as("probe_label")))
  }

  /** Embedding-cosine near-duplicate pairs: candidates from sign-LSH
    * buckets (all pairs within a bucket), kept when cosine >= minCos.
    * The dedup-by-embedding operator for training corpora: candidate
    * generation is linear in bucket sizes, never all-pairs.
    */
  def cosineNearDupPairs(corpus: DataFrame, nBits: Int, minCos: Double): DataFrame = {
    // both self-join legs re-derive this projection (one norm fold + one
    // sign fold per row) rather than persist it: recomputing a cheap
    // narrow projection beats caching a corpus-sized frame at 100 TB, and
    // the round-1 persist here leaked for the session lifetime.
    val b = graft.Par.spread(corpus).select(
        col("vec_id"), col("embedding"),
        VectorFns.l2Norm(col("embedding")).as("norm"),
        VectorFns.signBucket(col("embedding"), nBits).as("bucket"))
    val a = b.select(col("bucket"), col("vec_id").as("vec_a"),
      col("embedding").as("e_a"), col("norm").as("n_a"))
    val c = b.select(col("bucket"), col("vec_id").as("vec_b"),
      col("embedding").as("e_b"), col("norm").as("n_b"))
    a.join(c, "bucket")
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("score",
        when(col("n_a") > 0 && col("n_b") > 0,
          VectorFns.dot(col("e_a"), col("e_b")) / (col("n_a") * col("n_b"))))
      .filter(col("score") >= minCos)
      .select(col("vec_a"), col("vec_b"), round(col("score"), 4).as("score"))
  }

  /** LSH-bucketed ANN: join queries to corpus only within the same
    * sign-bit bucket, then top-k per query. Recall < 1.0; candidate set
    * (and shuffle volume) shrinks ~2^nBits-fold.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, nBits: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      VectorFns.l2Norm(col("embedding")).as("q_norm"),
      VectorFns.signBucket(col("embedding"), nBits).as("bucket"))
    val c = graft.Par.spread(corpus)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
        VectorFns.l2Norm(col("embedding")).as("c_norm"),
        VectorFns.signBucket(col("embedding"), nBits).as("bucket"))
    rankTopK(c.join(broadcast(q), "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", cosineScore), k)
  }
}
