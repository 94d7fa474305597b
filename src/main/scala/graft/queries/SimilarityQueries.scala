package graft.queries

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding similarity-search queries over `embeddings`
  * (vec_id, embedding array<float>, label).
  *
  * Scores are computed as strict left-to-right double folds so ranking is
  * bit-deterministic and reproducible in the DuckDB oracle.
  */
object SimilarityQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Exact brute-force top-5 cosine neighbors for query vectors vec_id<20.
    * Queries are broadcast; the corpus streams — no corpus shuffle.
    */
  def simTopkBruteforce(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.bruteForceTopK(emb.filter(col("vec_id") < 20), emb, k = 5)
      .orderBy("query_id", "rank")
  }

  val simTopkBruteforceSql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
      |           FROM embeddings WHERE vec_id < 20),
      |     c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
      |scored AS (
      |  SELECT query_id, neighbor_id,
      |    list_sum(list_transform(range(1, len(qe)+1),
      |                            i -> qe[i]::DOUBLE * ce[i]::DOUBLE)) /
      |    nullif(sqrt(list_sum(list_transform(range(1, len(qe)+1),
      |                            i -> qe[i]::DOUBLE * qe[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, len(ce)+1),
      |                            i -> ce[i]::DOUBLE * ce[i]::DOUBLE))), 0) AS score
      |  FROM q, c WHERE query_id <> neighbor_id
      |)
      |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
      |       round(score, 4) AS score
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |                               ORDER BY score DESC, neighbor_id) AS rank
      |  FROM scored
      |) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** ANN via 8-bit sign-LSH bucketing: candidates only within the same
    * bucket (~256x candidate reduction), then top-5 by exact cosine.
    */
  def simLshBucket(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.lshTopK(emb.filter(col("vec_id") < 50), emb, k = 5, nBits = 8)
      .orderBy("query_id", "rank")
  }

  val simLshBucketSql: String =
    """WITH b AS (
      |  SELECT vec_id, embedding,
      |         CAST(list_sum(list_transform(range(0, 8), i ->
      |           CASE WHEN embedding[i+1] > 0 THEN 1 << i ELSE 0 END)) AS BIGINT)
      |           AS bucket
      |  FROM embeddings
      |), q AS (SELECT vec_id AS query_id, embedding AS qe, bucket
      |         FROM b WHERE vec_id < 50),
      |   c AS (SELECT vec_id AS neighbor_id, embedding AS ce, bucket FROM b),
      |scored AS (
      |  SELECT query_id, neighbor_id,
      |    list_sum(list_transform(range(1, len(qe)+1),
      |                            i -> qe[i]::DOUBLE * ce[i]::DOUBLE)) /
      |    nullif(sqrt(list_sum(list_transform(range(1, len(qe)+1),
      |                            i -> qe[i]::DOUBLE * qe[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, len(ce)+1),
      |                            i -> ce[i]::DOUBLE * ce[i]::DOUBLE))), 0) AS score
      |  FROM q JOIN c USING (bucket) WHERE query_id <> neighbor_id
      |)
      |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
      |       round(score, 4) AS score
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |                               ORDER BY score DESC, neighbor_id) AS rank
      |  FROM scored
      |) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** IVF-style ANN: probe the nearest label-representative, then search
    * only that label partition.
    */
  def simIvfTopk(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.ivfTopK(emb.filter(col("vec_id") < 30), emb, k = 5)
      .orderBy("query_id", "rank")
  }

  val simIvfTopkSql: String =
    """WITH reps AS (
      |  SELECT label AS rep_label, embedding AS rep_emb FROM (
      |    SELECT label, embedding,
      |           row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
      |    FROM embeddings
      |  ) WHERE rn = 1
      |), q AS (
      |  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 30
      |), probed AS (
      |  SELECT query_id, qe, rep_label AS probe_label FROM (
      |    SELECT q.query_id, q.qe, r.rep_label,
      |      row_number() OVER (PARTITION BY q.query_id ORDER BY
      |        (list_sum(list_transform(range(1, len(q.qe)+1),
      |                                 i -> q.qe[i]::DOUBLE * r.rep_emb[i]::DOUBLE)) /
      |         nullif(sqrt(list_sum(list_transform(range(1, len(q.qe)+1),
      |                                 i -> q.qe[i]::DOUBLE * q.qe[i]::DOUBLE))) *
      |          sqrt(list_sum(list_transform(range(1, len(r.rep_emb)+1),
      |                                 i -> r.rep_emb[i]::DOUBLE * r.rep_emb[i]::DOUBLE))), 0))
      |        DESC, r.rep_label) AS pr
      |    FROM q, reps r
      |  ) WHERE pr = 1
      |), scored AS (
      |  SELECT p.query_id, e.vec_id AS neighbor_id, p.probe_label,
      |    list_sum(list_transform(range(1, len(p.qe)+1),
      |                            i -> p.qe[i]::DOUBLE * e.embedding[i]::DOUBLE)) /
      |    nullif(sqrt(list_sum(list_transform(range(1, len(p.qe)+1),
      |                            i -> p.qe[i]::DOUBLE * p.qe[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),
      |                            i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))), 0) AS score
      |  FROM probed p JOIN embeddings e ON e.label = p.probe_label
      |  WHERE e.vec_id <> p.query_id
      |)
      |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
      |       CAST(probe_label AS BIGINT) AS probe_label, round(score, 4) AS score
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |                               ORDER BY score DESC, neighbor_id) AS rank
      |  FROM scored
      |) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Embedding-cosine near-dup pairs (dedup family): sign-LSH candidate
    * buckets, exact cosine verification at >= 0.35.
    */
  def ddEmbedCosine(s: SparkSession, d: String): DataFrame =
    Similarity.cosineNearDupPairs(Tables.embeddings(s, d), nBits = 8, minCos = 0.35)
      .orderBy("vec_a", "vec_b")

  val ddEmbedCosineSql: String =
    """WITH b AS (
      |  SELECT vec_id, embedding,
      |         CAST(list_sum(list_transform(range(0, 8), i ->
      |           CASE WHEN embedding[i+1] > 0 THEN 1 << i ELSE 0 END)) AS BIGINT)
      |           AS bucket
      |  FROM embeddings
      |)
      |SELECT vec_a, vec_b, round(score, 4) AS score FROM (
      |  SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
      |    list_sum(list_transform(range(1, len(a.embedding)+1),
      |                            i -> a.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)) /
      |    nullif(sqrt(list_sum(list_transform(range(1, len(a.embedding)+1),
      |                            i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, len(c.embedding)+1),
      |                            i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE))), 0) AS score
      |  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
      |)
      |WHERE score >= 0.35 ORDER BY vec_a, vec_b""".stripMargin

  // ---- SemDeDup-style semantic dedup: pairs → clusters → keep/drop ----
  // The end-to-end embedding dedup decision (Abbas et al., "SemDeDup",
  // 2023, arXiv:2303.09540): sign-LSH buckets generate candidates, exact
  // cosine >= 0.35 keeps semantic-duplicate pairs, connected components
  // closes them transitively, and each cluster keeps exactly ONE
  // representative (the min vec_id — deterministic, no float argmax to
  // disagree about). Every corpus vector gets a verdict: singletons keep
  // themselves. Composes three already-scale-shaped pieces — bucketed
  // candidate generation (never all-pairs), star-contraction components
  // (skew-linear, checkpointed rounds), and one left join — so the whole
  // decision is a fixed number of bounded shuffles at any corpus size.
  def ddSemdedup(s: SparkSession, d: String): DataFrame =
    semdedupDerived(s, d, salt = None).sortWithinPartitions("vec_id")

  // Content-addressed CC over DISTINCT vectors: replicas of one embedding
  // share its bucket and have pairwise cosine exactly 1 (>= any sane
  // threshold), so they are always one component with their content-min —
  // the bucketed self-join therefore runs over distinct vectors only
  // (the naive shape ground through C(g,2) identical-vector pairs per
  // replica group before CC), and every vector's verdict re-expands
  // through the membership frame: label = the content's component label,
  // which for a singleton content is itself. The collapse key is the
  // embedding array (array grouping keys hash/compare natively).
  private[graft] def semdedupDerived(s: SparkSession, d: String,
                                     salt: Option[org.apache.spark.sql.Column]): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val H = graft.operators.Content.H
    val Gc = graft.operators.Content.G
    val reps0 = graft.operators.Content
      .repsById(emb, Seq("embedding"), idCol = "vec_id", salt = salt)
    val contents = reps0.select(col(H), col(Gc), col("vec_id"), col("embedding"))
    // float keys: membership is an engine-normalized JOIN on the vector,
    // not a recomputed hash — see Content.membership
    val members = graft.operators.Content
      .membership(emb, reps0, Seq("embedding"), "vec_id", salt)
    val pairs = Similarity
      .cosineNearDupPairs(contents.select("vec_id", "embedding"),
        nBits = 8, minCos = 0.35)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    // vec_a < vec_b pairs, and the membership join coalesces missing
    // labels to rep_id — the ccOverEdges contract
    val cc = graft.operators.TextDedup.ccOverEdges(pairs)
      .select(col("doc_id").as("rep_id"), col("cluster_id"))
    // zero-norm guard: a zero vector's cosine is NULL against everything —
    // including its own replicas — so the naive shape never pairs it and
    // every copy keeps itself; such members must NOT inherit their
    // content's label
    members
      .join(contents.select(col(H), col("vec_id").as("rep_id"),
        (graft.functions.VectorFns.l2Norm(col("embedding")) === 0).as("zero")), H)
      .join(cc, Seq("rep_id"), "left")
      .select(col("vec_id"),
        when(col("zero"), col("vec_id"))
          .otherwise(coalesce(col("cluster_id"), col("rep_id"))).as("cluster_id"))
      .withColumn("keep", col("cluster_id") === col("vec_id"))
      .select("vec_id", "cluster_id", "keep")
  }

  val ddSemdedupSql: String =
    """WITH RECURSIVE b AS (
      |  SELECT vec_id, embedding,
      |         CAST(list_sum(list_transform(range(0, 8), i ->
      |           CASE WHEN embedding[i+1] > 0 THEN 1 << i ELSE 0 END)) AS BIGINT)
      |           AS bucket
      |  FROM embeddings
      |), pairs AS (
      |  SELECT vec_a, vec_b FROM (
      |    SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
      |      list_sum(list_transform(range(1, len(a.embedding)+1),
      |                              i -> a.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)) /
      |      nullif(sqrt(list_sum(list_transform(range(1, len(a.embedding)+1),
      |                              i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE))) *
      |       sqrt(list_sum(list_transform(range(1, len(c.embedding)+1),
      |                              i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE))), 0) AS score
      |    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
      |  ) WHERE score >= 0.35
      |), nodes AS (
      |  SELECT DISTINCT vec_id
      |  FROM (SELECT vec_a AS vec_id FROM pairs
      |        UNION ALL SELECT vec_b FROM pairs)
      |), edges AS (
      |  SELECT vec_a AS src, vec_b AS dst FROM pairs
      |  UNION ALL SELECT vec_b, vec_a FROM pairs
      |), walk(node, label) AS (
      |  SELECT vec_id, vec_id FROM nodes
      |  UNION
      |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
      |), cc AS (
      |  SELECT node AS vec_id, min(label) AS cluster_id FROM walk GROUP BY node
      |)
      |SELECT e.vec_id,
      |       CAST(coalesce(cc.cluster_id, e.vec_id) AS BIGINT) AS cluster_id,
      |       coalesce(cc.cluster_id, e.vec_id) = e.vec_id AS keep
      |FROM embeddings e LEFT JOIN cc ON e.vec_id = cc.vec_id
      |ORDER BY e.vec_id""".stripMargin

  // ---- scalar quantization (int8-style codes, the vector-compression
  // step before ANN index build) ----
  // floor-based so both engines compute bit-identical codes: the full
  // expression ((x - mn) * 255 / (mx - mn)) is a single deterministic
  // IEEE evaluation order, and floor of it is exact — round() would
  // diverge at representation midpoints. Codes are summarized as exact
  // integer stats (hash-safe); per-row work is a pure projection.
  // Content-addressed (Content.perContent over the embedding array): the
  // per-element quantize lambda is CodegenFallback (interpreted), so
  // running it once per DISTINCT vector is the difference between
  // corpus-width and vocabulary-width interpreted work.
  def embQuantize(s: SparkSession, d: String): DataFrame =
    quantizeDerived(s, d, salt = None).sortWithinPartitions("vec_id")

  private[graft] def quantizeDerived(s: SparkSession, d: String,
                                     salt: Option[org.apache.spark.sql.Column]): DataFrame =
    graft.operators.Content.perContent(
        Tables.embeddings(s, d), Seq("embedding"), idCol = "vec_id",
        salt = salt) { reps =>
      val H = graft.operators.Content.H
      reps
        .select(col(H), col("embedding"),
          array_min(col("embedding")).cast("double").as("mn"),
          array_max(col("embedding")).cast("double").as("mx"))
        .select(col(H),
          transform(col("embedding"), x =>
            when(col("mx") > col("mn"),
              floor((x.cast("double") - col("mn")) * 255.0 / (col("mx") - col("mn"))))
              .otherwise(lit(0L))).as("codes"),
          size(col("embedding")).cast("long").as("n_dims"))
        .select(col(H), col("n_dims"),
          aggregate(col("codes"), lit(0L), (acc, c) => acc + c).as("code_sum"),
          array_min(col("codes")).as("code_min"),
          array_max(col("codes")).as("code_max"))
    }

  val embQuantizeSql: String =
    """WITH q AS (
      |  SELECT vec_id, embedding,
      |         CAST(list_min(embedding) AS DOUBLE) AS mn,
      |         CAST(list_max(embedding) AS DOUBLE) AS mx
      |  FROM embeddings
      |), c AS (
      |  SELECT vec_id,
      |         list_transform(embedding, x ->
      |           CASE WHEN mx > mn
      |                THEN CAST(floor((CAST(x AS DOUBLE) - mn) * 255.0 / (mx - mn)) AS BIGINT)
      |                ELSE 0 END) AS codes,
      |         CAST(len(embedding) AS BIGINT) AS n_dims
      |  FROM q
      |)
      |SELECT vec_id, n_dims,
      |       CAST(list_sum(codes) AS BIGINT) AS code_sum,
      |       CAST(list_min(codes) AS BIGINT) AS code_min,
      |       CAST(list_max(codes) AS BIGINT) AS code_max
      |FROM c ORDER BY vec_id""".stripMargin

  /** ANN quality-eval harness: recall@5 of the sign-LSH index against
    * exact brute force, per query. Both sides are deterministic rankings
    * (identical fold order), so recall is itself oracle-exact — the
    * evaluation loop a production index build runs after every reindex.
    * The overlap join touches only (query_id, neighbor_id) pairs — 5
    * rows per query per side regardless of corpus size.
    */
  def simRecall(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(q, emb, k = 5)
      .select(col("query_id"), col("neighbor_id"))
    val ls = Similarity.lshTopK(q, emb, k = 5, nBits = 8)
      .select(col("query_id").as("lq"), col("neighbor_id").as("ln"))
    val hits = bf
      .join(ls, col("query_id") === col("lq") && col("neighbor_id") === col("ln"),
        "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    q.select(col("vec_id").as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_hits"))
      .select(col("query_id"), col("n_hits"),
        (col("n_hits") / 5.0).as("recall_at_5"))
      .orderBy("query_id")
  }

  private val CosExpr =
    """list_sum(list_transform(range(1, len(qe)+1),
      |                        i -> qe[i]::DOUBLE * ce[i]::DOUBLE)) /
      |nullif(sqrt(list_sum(list_transform(range(1, len(qe)+1),
      |                        i -> qe[i]::DOUBLE * qe[i]::DOUBLE))) *
      | sqrt(list_sum(list_transform(range(1, len(ce)+1),
      |                        i -> ce[i]::DOUBLE * ce[i]::DOUBLE))), 0)""".stripMargin

  val simRecallSql: String =
    s"""WITH q0 AS (SELECT vec_id AS query_id, embedding AS qe
      |            FROM embeddings WHERE vec_id < 20),
      |     c0 AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
      |bf AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id,
      |           row_number() OVER (PARTITION BY query_id
      |                              ORDER BY score DESC, neighbor_id) AS rank
      |    FROM (SELECT query_id, neighbor_id, $CosExpr AS score
      |          FROM q0, c0 WHERE query_id <> neighbor_id))
      |  WHERE rank <= 5
      |), b AS (
      |  SELECT vec_id, embedding,
      |         CAST(list_sum(list_transform(range(0, 8), i ->
      |           CASE WHEN embedding[i+1] > 0 THEN 1 << i ELSE 0 END)) AS BIGINT)
      |           AS bucket
      |  FROM embeddings
      |), ql AS (SELECT vec_id AS query_id, embedding AS qe, bucket
      |          FROM b WHERE vec_id < 20),
      |   cl AS (SELECT vec_id AS neighbor_id, embedding AS ce, bucket FROM b),
      |ls AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id,
      |           row_number() OVER (PARTITION BY query_id
      |                              ORDER BY score DESC, neighbor_id) AS rank
      |    FROM (SELECT query_id, neighbor_id, $CosExpr AS score
      |          FROM ql JOIN cl USING (bucket) WHERE query_id <> neighbor_id))
      |  WHERE rank <= 5
      |), hits AS (
      |  SELECT bf.query_id, CAST(count(*) AS BIGINT) AS n_hits
      |  FROM bf JOIN ls ON bf.query_id = ls.query_id
      |               AND bf.neighbor_id = ls.neighbor_id
      |  GROUP BY 1
      |)
      |SELECT q0.query_id, coalesce(h.n_hits, 0) AS n_hits,
      |       coalesce(h.n_hits, 0) / 5.0 AS recall_at_5
      |FROM q0 LEFT JOIN hits h ON q0.query_id = h.query_id
      |ORDER BY q0.query_id""".stripMargin

  // ---- EMB: deterministic Lloyd's k-means (IVF centroid training) ----
  // The IVF variants above use rule-based representatives; this trains
  // real centroids. Floating-point k-means is not cross-engine
  // reproducible (centroid sums are order-dependent), so the whole
  // iteration runs on floor-quantized integer vectors (×2^20): sums are
  // exact BIGINTs, centroid components are truncating integer division,
  // squared-L2 distances are exact BIGINTs (|x|≤2^21 ⇒ per-dim diff² ≤
  // 2^44, ×64 dims ≤ 2^50 — no overflow), and argmin ties break on the
  // lower centroid id. The fixpoint trajectory is bit-identical anywhere.
  //
  // Scale design per iteration: assignment is corpus ⨯ broadcast(k
  // centroids) — a map-only pass plus one argmin shuffle keyed on
  // vec_id (partial-aggregated, one row per vector); the update is a
  // posexplode to (cluster, dim) cells whose map-side combine collapses
  // to ≤ 32·k·64 partial rows per executor before the 2-byte-key
  // shuffle. Nothing driver-side, nothing quadratic; 3 fixed rounds.
  //
  // Two measured hot-path rules (40 s → ~3 s together at the 100× SF):
  //  - the squared-L2 is NOT the aggregate(zip_with(...)) HOF — that's
  //    CodegenFallback, allocating an array and interpreting two lambdas
  //    per pair; it's the algebraic expansion |q|² − 2q·c + |c|² over
  //    the codegen'd integer dot product (plans/DotProductL), with |q|²
  //    staged once per vector and |c|² once per centroid. Long math is
  //    associative, so the expansion is bit-equal to the per-dim fold.
  //  - each iteration's 8-row centroid table is STAGED to scratch
  //    parquet (PageRank's pattern): chaining iteration k's plan onto
  //    iteration k−1's re-embeds every earlier assignment into one
  //    deeply nested DAG that re-executes per level.
  private val KmK = 8
  private val KmIters = 3
  private val KmScale = 1048576L // 2^20

  def embKmeans(s: SparkSession, d: String): DataFrame =
    kmeansDerived(s, d, salt = None).orderBy("cid")

  // Content-addressed WEIGHTED Lloyd's — exact, not approximate: every
  // replica of a vector gets the same assignment (identical distances,
  // same struct-min tiebreak), so the assignment step runs over DISTINCT
  // vectors and the centroid update weights each content by its replica
  // mass `G` (sx = Σ G·x, n = Σ G — bit-identical to summing members).
  // The final cluster summary re-weights the same way; rep_vec is the
  // min of per-content min ids. Only the INIT step needs member ids (the
  // k lowest vec_ids, which may include two copies of one vector — the
  // naive definition), so the k-row TakeOrdered runs on the compact
  // membership frame and joins its content's quantized vector.
  private[graft] def kmeansDerived(s: SparkSession, d: String,
                                   salt: Option[org.apache.spark.sql.Column]): DataFrame = {
    import graft.plans.DotProductL.dotL
    val H = graft.operators.Content.H
    val Gc = graft.operators.Content.G
    val scratch = graft.Scratch.dir(s, "graft_km_")
    def stage(c: DataFrame, name: String): DataFrame =
      graft.Scratch.writeRead(c, s"$scratch/$name")

    val emb = Tables.embeddings(s, d)
    val reps0 = graft.operators.Content
      .repsById(emb, Seq("embedding"), idCol = "vec_id", salt = salt)
    // float keys: membership joins the rep frame on the vector itself —
    // see Content.membership (it is only consumed k-row-limited below)
    val members = graft.operators.Content
      .membership(emb, reps0, Seq("embedding"), "vec_id", salt)
    // quantize ONCE per distinct vector and stage: transform()'s lambda
    // is CodegenFallback (interpreted per element), and every iteration +
    // the final pass is its own action — staged, later actions read plain
    // long columns (and the collapse means vocabulary-width, not
    // corpus-width, interpreted work)
    val q = stage(reps0
      .select(col(H), col(Gc), col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * lit(KmScale.toDouble)).cast("long")).as("q"))
      .withColumn("qq", dotL(col("q"), col("q"))), "q")

    // init: the k lowest MEMBER vec_ids, cid = 0..k-1 in id order
    var cent = stage(members.orderBy("vec_id").limit(KmK)
      .join(q.select(col(H), col("q")), H)
      .select((row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("vec_id")) - 1)
          .cast("long").as("cid"),
        col("q").as("cvec")), "cent_0")

    // argmin as a struct-min over (dist, cid) ONLY — an earlier version
    // carried q inside the min struct to save the re-join below, but a
    // 512-byte array in every partial-agg buffer update is a copy per
    // input row; the compact agg + a join against the staged q table is
    // measurably cheaper, and the join is on the staged parquet (no
    // recompute)
    def assign(c: DataFrame): DataFrame =
      q.crossJoin(broadcast(c.withColumn("cc", dotL(col("cvec"), col("cvec")))))
        .withColumn("dist",
          col("qq") - lit(2L) * dotL(col("q"), col("cvec")) + col("cc"))
        .groupBy("vec_id")
        .agg(min(struct(col("dist"), col("cid"))).as("m"),
          max(col(Gc)).as("g"))
        .select(col("vec_id"), col("m.cid").as("cid"), col("m.dist").as("dist"),
          col("g"))

    for (i <- 1 to KmIters) {
      val a = assign(cent)
      // empty clusters drop out (inner aggregate) — mirrored by the oracle
      cent = a.join(q.select("vec_id", "q"), "vec_id")
        .select(col("cid"), col("g"), posexplode(col("q")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg(sum(col("x") * col("g")).as("sx"), sum(col("g")).as("n"))
        // truncating division with explicit sign so Spark's `div` and the
        // oracle's abs-floor-div agree on negative sums
        .select(col("cid"), col("pos"),
          (when(col("sx") < 0, -1L).otherwise(1L) *
            expr("abs(sx) div n")).as("cx"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
          p => p.getField("cx")).as("cvec"))
      cent = stage(cent, s"cent_$i")
    }

    assign(cent)
      .groupBy("cid")
      .agg(sum("g").as("n_members"),
        min("vec_id").as("rep_vec"),
        sum(col("dist") * col("g")).as("inertia"))
  }

  val embKmeansSql: String = {
    val dist =
      """list_sum(list_transform(range(1, len(q)+1),
        |          i -> (q[i] - cvec[i]) * (q[i] - cvec[i])))""".stripMargin
    def assignCte(centCte: String, name: String) =
      s"""$name AS (
         |  SELECT vec_id, cid, dist, q FROM (
         |    SELECT e.vec_id, c.cid, $dist AS dist, e.q,
         |           row_number() OVER (PARTITION BY e.vec_id
         |                              ORDER BY $dist, c.cid) AS rk
         |    FROM qv e, $centCte c)
         |  WHERE rk = 1
         |)""".stripMargin
    val rounds = (1 to KmIters).map { i =>
      s"""${assignCte(s"cent${i - 1}", s"asg$i")},
         |cells$i AS (
         |  SELECT cid, unnest(range(1, len(q)+1)) AS pos, unnest(q) AS x
         |  FROM asg$i
         |),
         |cent$i AS (
         |  SELECT cid, list(cx ORDER BY pos) AS cvec FROM (
         |    SELECT cid, pos,
         |           CAST(CASE WHEN sum(x) < 0 THEN -1 ELSE 1 END AS BIGINT)
         |             * (abs(sum(x)) // count(*)) AS cx
         |    FROM cells$i GROUP BY cid, pos)
         |  GROUP BY cid
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH qv AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           x -> CAST(floor(CAST(x AS DOUBLE) * $KmScale.0) AS BIGINT)) AS q
       |  FROM embeddings
       |),
       |cent0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
       |         q AS cvec
       |  FROM (SELECT vec_id, q FROM qv ORDER BY vec_id LIMIT $KmK)
       |),
       |$rounds,
       |${assignCte(s"cent$KmIters", "final_asg")}
       |SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
       |       min(vec_id) AS rep_vec, CAST(sum(dist) AS BIGINT) AS inertia
       |FROM final_asg GROUP BY cid ORDER BY cid""".stripMargin
  }

  // ---- product quantization: compressed codes + asymmetric-distance ANN ----
  // The memory-bound ANN family IVF/LSH don't cover: each 64-dim vector
  // compresses to PqM codebook codes (here 4 bytes of state per vector —
  // the reason a 100 TB embedding corpus can be searched from RAM), and
  // query-to-vector distance is approximated as the sum of per-subspace
  // distances from the QUERY to each sub-CODEBOOK entry (asymmetric
  // distance computation — Jégou, Douze, Schmid, "Product Quantization
  // for Nearest Neighbor Search", TPAMI 2011). Everything is integer:
  // vectors quantize to 2^20-scaled longs (the emb_kmeans move), codebooks
  // train with truncating-division Lloyd's, and ADC distances are exact
  // integer sums — so both engines rank bit-identically with no float
  // formatting anywhere.
  //
  // Scale shape, stage by stage at 1000 executors:
  //  - cells is a linear projection (corpus × PqM subvector rows);
  //  - codebook training touches the corpus PqIters times, each pass a
  //    broadcast join against the (PqM × PqK)-row codebook — no shuffle
  //    wider than the (vec, subspace) partial-agg;
  //  - encoding is one more broadcast-join pass; at production scale the
  //    codes table (vec_id, PqM bytes) IS the persisted index — 64×
  //    smaller than the raw float corpus;
  //  - ADC joins the broadcast query distance-table (Q × PqM × PqK rows)
  //    and map-side-collapses the PqM terms per (query, vec) before the
  //    per-query top-k. No stage moves the raw vectors after encoding.
  private val PqM = 8        // subspaces over the 64-dim embeddings
  private val PqSub = 8      // dims per subspace
  private val PqK = 16       // codebook entries per subspace
  private val PqIters = 2
  private val PqScale = 1048576L // 2^20, same quantization as emb_kmeans
  private[graft] val PqNQ = 50      // query vectors: vec_id < 50 (recall eval needs the power)
  private val PqTopK = 5
  private val PqTrainN = 1500 // codebook training sample: vec_id < 1500

  /** Integer squared L2 between two array<long> columns, expanded to
    * `|a|² − 2a·b + |b|²` over the codegen'd [[graft.plans.DotProductL]]
    * loop — bit-identical to the naive Σ(aᵢ−bᵢ)² fold (exact long
    * arithmetic, overflow-free at the 2^20 grid: per-term ≤ 2^42, 64-dim
    * sums ≤ 2^48), but ~an order of magnitude faster than the
    * `aggregate(zip_with(...))` higher-order form, which is
    * CodegenFallback and interprets two lambdas per element. Measured on
    * the 10× rung before the swap: the three corpus×50-query recall
    * evals cost 7–8 s EACH from interpreted lambdas alone.
    */
  private def distL2(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import graft.plans.DotProductL.dotL
    dotL(a, a) - lit(2L) * dotL(a, b) + dotL(b, b)
  }

  /** Quantize raw (vec_id, embedding) rows to the integer grid the whole
    * PQ pipeline runs on. The PqM×PqSub subspace split hard-codes the
    * 64-dim layout — a drifted embedding width would make `slice` emit
    * SHORT subvectors and corrupt every distance silently, so wrong
    * width fails loudly per row instead (the Tables.events fail-fast
    * doctrine; testdata regenerates every round).
    */
  private[graft] def pqQuantize(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      when(size(col("embedding")) === PqM * PqSub,
        transform(col("embedding"),
          x => floor(x.cast("double") * lit(PqScale.toDouble)).cast("long")))
        .otherwise(raise_error(concat(
          lit(s"sim_pq: embedding dim != ${PqM * PqSub}: "),
          size(col("embedding")).cast("string")))
          .cast("array<long>")).as("q"))

  /** Split quantized vectors into per-subspace (vec_id, m, sub) cells. */
  private[graft] def pqCells(qv: DataFrame): DataFrame =
    qv.select(col("vec_id"), explode(sequence(lit(0), lit(PqM - 1))).as("m"),
        col("q"))
      .select(col("vec_id"), col("m"),
        slice(col("q"), col("m") * PqSub + 1, lit(PqSub)).as("sub"))

  /** ADC top-k: probe query cells against the (cent, codes) index — the
    * per-batch serving path shared by batch `sim_pq` and the streaming
    * twin ([[graft.streaming.AnnStream]]). Queries never see raw corpus
    * vectors: the distance table is Q×PqM×PqK rows, broadcast.
    */
  private[graft] def pqProbe(qcells: DataFrame, cent: DataFrame,
                             codes: DataFrame,
                             topK: Int = PqTopK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dt = qcells
      .join(broadcast(cent), "m")
      .select(col("vec_id").as("query_id"), col("m"), col("code"),
        distL2(col("sub"), col("cvec")).as("dcode"))
    codes.join(broadcast(dt), Seq("m", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy("query_id", "vec_id")
      .agg(sum("dcode").as("adc_dist"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adc_dist"), col("vec_id")))
        .cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("adc_dist"))
  }

  /** The persisted PQ index for a dataset: (codebook, code table), built
    * once per (session, dir) and staged to scratch parquet.
    */
  private[graft] def pqIndex(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    // The codebook + code table are a BUILT-ONCE persisted index (the
    // dd_incremental / a14 doctrine): production encodes the corpus once
    // and serves every query batch from the codes, so the memoized
    // stagedFrame is the honest query shape — repeat invocations measure
    // the ADC probe against existing codes, not an index rebuild. (Before
    // this move sim_pq was the ladder's worst query: 28.7 s at 100×, all
    // of it re-training + re-encoding per bench repetition.)
    // digest, not sanitized path: the sanitization is lossy (distinct
    // dirs can collide and cross-wire persisted PQ indexes) — same
    // contract as every other staged call site
    val tag = graft.Scratch.digest(d)
    def stage(c: => DataFrame, name: String): DataFrame =
      graft.Scratch.stagedFrame(s, s"pq_${name}_$tag")(c)
    // NEGATIVE RESULT (r7, sf0.1 min-of-3, repeated): pinning the
    // <=PqM*PqK-row codebooks with localCheckpoint(eager) instead of the
    // parquet round-trip does NOT help — 3.7-4.3 s either way, within
    // run-to-run noise. The fixed cost is per-job scheduling of the
    // training iterations, not the staging medium (sf0.001 already costs
    // 2.5 s), so all stages stay on the one parquet idiom the rest of the
    // repo uses.
    var pinSeq = -1
    def pin(c: => DataFrame): DataFrame = { pinSeq += 1; stage(c, s"cent_$pinSeq") }

    val qv = pqQuantize(Tables.embeddings(s, d))
    // (vec_id, m, sub): the corpus split into per-subspace rows — staged
    // because every training round, the encode pass, and the query
    // distance table all read it
    val cells = stage(pqCells(qv), "cells")
    // codebooks train on a bounded deterministic prefix sample, the
    // standard PQ shape (Jégou 2011 trains on ~100k vectors regardless of
    // corpus size): the full corpus is ENCODED but never iterated by
    // Lloyd's. Measured before the bound: training passes made sim_pq
    // grow 3.3 → 8.2 s from 1× to 10× on the ladder; with the sample the
    // per-rung growth is the encode+ADC passes only. At the driver's
    // correctness SFs (500 vectors) the sample IS the corpus, so the
    // oracle gate exercises the full-corpus codebook; the oracle mirrors
    // the same vec_id bound, so the gate stays exact at any SF.
    val tcells = cells.filter(col("vec_id") < PqTrainN)

    // init: per subspace, codes 0..PqK-1 are the subvectors of PqK
    // LABEL-STRATIFIED hash-ranked training vectors — round-robin across
    // label strata (rank within label by md5("pqseed|"+id), take the
    // first seed of every label before any label's second), so the seeds
    // are guaranteed to cover every cluster the metadata knows about.
    // Deterministic, RNG-free, oracle-mirrorable (ds_shuffle's order-key
    // idiom). Measured on the round-8 testdata at 50 queries: 20.8%/25.6%
    // recall@5 for the old lowest-vec_id init (a LUCKY spread there — low
    // ids happen to cover 8/10 labels, but nothing guarantees it),
    // 15.6%/17.6% for unstratified hash ranking (draws 6/10 labels),
    // stratified = guaranteed 10/10 coverage. Seeds come from the
    // TRAINING prefix so every seed row exists in tcells.
    val wSeed = Window.partitionBy("label").orderBy("hs", "vec_id")
    val seeds = Tables.embeddings(s, d).filter(col("vec_id") < PqTrainN)
      .select(col("vec_id"), col("label"),
        md5(concat(lit("pqseed|"), col("vec_id").cast("string"))).as("hs"))
      .withColumn("rl", row_number().over(wSeed))
      .orderBy("rl", "label").limit(PqK).select("vec_id")
    var cent = pin(
      tcells.join(seeds, "vec_id")
        .withColumn("code", (row_number().over(
          Window.partitionBy("m").orderBy("vec_id")) - 1).cast("long"))
        .select(col("m"), col("code"), col("sub").as("cvec")))

    // nearest code per (vec, subspace): broadcast the tiny codebook, ties
    // to the lowest code via the struct-min (same idiom as emb_kmeans)
    def assign(on: DataFrame, c: DataFrame): DataFrame =
      on.join(broadcast(c), "m")
        .withColumn("dist", distL2(col("sub"), col("cvec")))
        .groupBy("vec_id", "m")
        .agg(min(struct(col("dist"), col("code"))).as("mm"))
        .select(col("vec_id"), col("m"),
          col("mm.code").as("code"), col("mm.dist").as("dist"))

    for (i <- 1 to PqIters) {
      cent = pin(
        assign(tcells, cent).join(tcells, Seq("vec_id", "m"))
          .select(col("m"), col("code"), posexplode(col("sub")).as(Seq("pos", "x")))
          .groupBy("m", "code", "pos")
          .agg(sum("x").as("sx"), count(lit(1)).as("n"))
          // truncating division with explicit sign — `div` vs the
          // oracle's abs-floor-div agree on negative sums (emb_kmeans)
          .select(col("m"), col("code"), col("pos"),
            (when(col("sx") < 0, -1L).otherwise(1L) *
              expr("abs(sx) div n")).as("cx"))
          .groupBy("m", "code")
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
            p => p.getField("cx")).as("cvec")))
    }

    // encode the FULL corpus — the persisted index
    val codes = stage(assign(cells, cent).select("vec_id", "m", "code"),
      "codes")
    (cent, codes)
  }

  def simPq(s: SparkSession, d: String): DataFrame = {
    val (cent, codes) = pqIndex(s, d)
    // the per-query ADC distance table is built fresh each invocation —
    // that IS the query
    val qcells = pqCells(pqQuantize(
      Tables.embeddings(s, d).filter(col("vec_id") < PqNQ)))
    pqProbe(qcells, cent, codes).orderBy("query_id", "rank")
  }

  /** The full PQ oracle chain as a WITH body ending in `pq_top`
    * (query_id, rank, neighbor_id, adc_dist) — shared verbatim by
    * `sim_pq` and `sim_pq_recall`, the dd_lsh_recall embedding doctrine:
    * the evaluation can never drift from the query it evaluates.
    */
  private def pqSqlChain: String = {
    val dist =
      """list_sum(list_transform(range(1, len(sub)+1),
        |            i -> (sub[i] - cvec[i]) * (sub[i] - cvec[i])))""".stripMargin
    def assignCte(centCte: String, name: String, src: String) =
      s"""$name AS (
         |  SELECT vec_id, m, code, sub FROM (
         |    SELECT c.vec_id, c.m, ct.code, c.sub,
         |           row_number() OVER (PARTITION BY c.vec_id, c.m
         |                              ORDER BY $dist, ct.code) AS rk
         |    FROM $src c JOIN $centCte ct ON c.m = ct.m)
         |  WHERE rk = 1
         |)""".stripMargin
    val rounds = (1 to PqIters).map { i =>
      s"""${assignCte(s"cent${i - 1}", s"asg$i", "tcells")},
         |cpos$i AS (
         |  SELECT m, code, unnest(range(1, len(sub)+1)) AS pos, unnest(sub) AS x
         |  FROM asg$i
         |),
         |cent$i AS (
         |  SELECT m, code, list(cx ORDER BY pos) AS cvec FROM (
         |    SELECT m, code, pos,
         |           CAST(CASE WHEN sum(x) < 0 THEN -1 ELSE 1 END AS BIGINT)
         |             * (abs(sum(x)) // count(*)) AS cx
         |    FROM cpos$i GROUP BY m, code, pos)
         |  GROUP BY m, code
         |)""".stripMargin
    }.mkString(",\n")
    s"""qv AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           x -> CAST(floor(CAST(x AS DOUBLE) * $PqScale.0) AS BIGINT)) AS q
       |  FROM embeddings
       |),
       |cells AS (
       |  SELECT vec_id, m, q[m*$PqSub+1 : (m+1)*$PqSub] AS sub
       |  FROM qv, (SELECT unnest(range(0, $PqM)) AS m)
       |),
       |tcells AS (SELECT * FROM cells WHERE vec_id < $PqTrainN),
       |cent0 AS (
       |  SELECT m,
       |         CAST(row_number() OVER (PARTITION BY m ORDER BY vec_id) - 1
       |              AS BIGINT) AS code,
       |         sub AS cvec
       |  FROM tcells
       |  WHERE vec_id IN (
       |    SELECT vec_id FROM (
       |      SELECT vec_id, label,
       |             row_number() OVER (PARTITION BY label
       |               ORDER BY md5('pqseed|' || CAST(vec_id AS VARCHAR)),
       |                        vec_id) AS rl
       |      FROM embeddings WHERE vec_id < $PqTrainN)
       |    ORDER BY rl, label LIMIT $PqK)
       |),
       |$rounds,
       |${assignCte(s"cent$PqIters", "codes", "cells")},
       |dt AS (
       |  SELECT qy.vec_id AS query_id, ct.m, ct.code, $dist AS dcode
       |  FROM (SELECT vec_id, m, sub FROM cells WHERE vec_id < $PqNQ) qy
       |  JOIN cent$PqIters ct ON qy.m = ct.m
       |),
       |adc AS (
       |  SELECT d.query_id, c.vec_id AS neighbor_id,
       |         CAST(sum(d.dcode) AS BIGINT) AS adc_dist
       |  FROM codes c JOIN dt d ON c.m = d.m AND c.code = d.code
       |  WHERE c.vec_id <> d.query_id
       |  GROUP BY 1, 2
       |),
       |pq_top AS (
       |  SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, adc_dist
       |  FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY adc_dist, neighbor_id) AS rank
       |    FROM adc
       |  ) WHERE rank <= $PqTopK
       |)""".stripMargin
  }

  val simPqSql: String =
    s"""WITH $pqSqlChain
       |SELECT query_id, rank, neighbor_id, adc_dist
       |FROM pq_top ORDER BY query_id, rank""".stripMargin

  /** Recall@5 of the PQ probe against the EXACT integer-L2 ranking over
    * the same quantized grid — the compressed index's quality eval, as
    * `sim_recall` is the LSH index's. Truth is L2 (the metric ADC
    * approximates), not cosine; both sides are deterministic integer
    * rankings, so the recall numbers themselves are oracle-certified.
    * Scale: the exact side is query-broadcast × corpus (the same cost an
    * exact re-ranking pass costs anyway); the PQ side reads the persisted
    * codes.
    */
  def simPqRecall(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (cent, codes) = pqIndex(s, d)
    val qv = pqQuantize(Tables.embeddings(s, d))
    val qq = qv.filter(col("vec_id") < PqNQ)
    val pq = pqProbe(pqCells(qq), cent, codes)
      .select(col("query_id"), col("neighbor_id"))
    val exact = qv.select(col("vec_id").as("neighbor_id"), col("q").as("cq"))
      .crossJoin(broadcast(qq.select(col("vec_id").as("query_id"),
        col("q").as("qq"))))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        distL2(col("qq"), col("cq")).as("d2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d2"), col("neighbor_id"))))
      .filter(col("rk") <= PqTopK)
      .select("query_id", "neighbor_id")
    val hits = pq.join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    qq.select(col("vec_id").as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_hits"))
      .select(col("query_id"), col("n_hits"),
        // 10000/PqTopK bp per hit — a multiple, so no division anywhere
        (col("n_hits") * lit(10000L / PqTopK)).cast("long").as("recall_bp"))
      .orderBy("query_id")
  }

  val simPqRecallSql: String =
    s"""WITH $pqSqlChain,
       |exact AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT qy.vec_id AS query_id, c.vec_id AS neighbor_id,
       |           row_number() OVER (PARTITION BY qy.vec_id ORDER BY
       |             list_sum(list_transform(range(1, len(qy.q)+1),
       |               i -> (qy.q[i] - c.q[i]) * (qy.q[i] - c.q[i]))),
       |             c.vec_id) AS rk
       |    FROM (SELECT * FROM qv WHERE vec_id < $PqNQ) qy, qv c
       |    WHERE c.vec_id <> qy.vec_id)
       |  WHERE rk <= $PqTopK
       |), hits AS (
       |  SELECT p.query_id, CAST(count(*) AS BIGINT) AS n_hits
       |  FROM pq_top p JOIN exact e
       |    ON p.query_id = e.query_id AND p.neighbor_id = e.neighbor_id
       |  GROUP BY 1
       |)
       |SELECT q.query_id,
       |       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       |       CAST(COALESCE(h.n_hits, 0) * ${10000 / PqTopK} AS BIGINT)
       |         AS recall_bp
       |FROM (SELECT vec_id AS query_id FROM qv WHERE vec_id < $PqNQ) q
       |LEFT JOIN hits h USING (query_id)
       |ORDER BY query_id""".stripMargin

  // ---- ADC shortlist + exact re-rank: the production PQ serving shape ----
  // A compressed index is never served raw: ADC ranks a SHORTLIST
  // (top-PqR, here 50), then the shortlist alone is re-ranked by exact
  // distance on the stored vectors (Jégou et al. 2011 §IV-E). Recall
  // then depends on the shortlist containing the true neighbors — far
  // easier than ADC ordering them — while the exact pass touches only
  // Q×PqR rows. Scale shape: the shortlist (with its query vectors)
  // broadcasts; the corpus-side quantized vectors join on vec_id and
  // never shuffle; ranks come from a per-query window over ≤PqR rows.
  private[graft] val PqR = 50

  def simPqRerank(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (cent, codes) = pqIndex(s, d)
    val qv = pqQuantize(Tables.embeddings(s, d))
    val qq = qv.filter(col("vec_id") < PqNQ)
    val short = pqProbe(pqCells(qq), cent, codes, PqR)
      .select(col("query_id"), col("neighbor_id"))
    qv.select(col("vec_id").as("neighbor_id"), col("q").as("cq"))
      .join(broadcast(short.join(
        qq.select(col("vec_id").as("query_id"), col("q").as("qq")),
        "query_id")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        distL2(col("qq"), col("cq")).as("d2"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d2"), col("neighbor_id")))
        .cast("long"))
      .filter(col("rank") <= PqTopK)
      .select("query_id", "rank", "neighbor_id", "d2")
      .orderBy("query_id", "rank")
  }

  /** The shortlist + exact-rerank CTEs appended to [[pqSqlChain]] —
    * shared verbatim by `sim_pq_rerank` and `sim_rerank_recall` (the
    * recall can never drift from the query it evaluates).
    */
  private def rerankSqlChain: String =
    s"""pq_short AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY adc_dist, neighbor_id) AS rk
       |    FROM adc) WHERE rk <= $PqR
       |),
       |rr AS (
       |  SELECT s.query_id, s.neighbor_id,
       |         CAST(list_sum(list_transform(range(1, len(q.q)+1),
       |              i -> (q.q[i] - c.q[i]) * (q.q[i] - c.q[i]))) AS BIGINT)
       |           AS d2
       |  FROM pq_short s
       |  JOIN qv q ON q.vec_id = s.query_id
       |  JOIN qv c ON c.vec_id = s.neighbor_id
       |),
       |rr_top AS (
       |  SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, d2
       |  FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY d2, neighbor_id) AS rank
       |    FROM rr
       |  ) WHERE rank <= $PqTopK
       |)""".stripMargin

  val simPqRerankSql: String =
    s"""WITH $pqSqlChain,
       |$rerankSqlChain
       |SELECT query_id, rank, neighbor_id, d2
       |FROM rr_top ORDER BY query_id, rank""".stripMargin

  /** Recall@5 of the reranked PQ probe vs the exact integer-L2 top-5 —
    * the eval that shows WHY production serves shortlist+rerank: ADC
    * alone orders noisily ([[simPqRecall]]); a 50-deep shortlist only
    * has to CONTAIN the true top-5.
    */
  def simRerankRecall(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rr = simPqRerank(s, d).select("query_id", "neighbor_id")
    val qv = pqQuantize(Tables.embeddings(s, d))
    val qq = qv.filter(col("vec_id") < PqNQ)
    val exact = qv.select(col("vec_id").as("neighbor_id"), col("q").as("cq"))
      .crossJoin(broadcast(qq.select(col("vec_id").as("query_id"),
        col("q").as("qq"))))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        distL2(col("qq"), col("cq")).as("d2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d2"), col("neighbor_id"))))
      .filter(col("rk") <= PqTopK)
      .select("query_id", "neighbor_id")
    val hits = rr.join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    qq.select(col("vec_id").as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_hits"))
      .select(col("query_id"), col("n_hits"),
        (col("n_hits") * lit(10000L / PqTopK)).cast("long").as("recall_bp"))
      .orderBy("query_id")
  }

  val simRerankRecallSql: String =
    s"""WITH $pqSqlChain,
       |$rerankSqlChain,
       |exact AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT qy.vec_id AS query_id, c.vec_id AS neighbor_id,
       |           row_number() OVER (PARTITION BY qy.vec_id ORDER BY
       |             list_sum(list_transform(range(1, len(qy.q)+1),
       |               i -> (qy.q[i] - c.q[i]) * (qy.q[i] - c.q[i]))),
       |             c.vec_id) AS rk
       |    FROM (SELECT * FROM qv WHERE vec_id < $PqNQ) qy, qv c
       |    WHERE c.vec_id <> qy.vec_id)
       |  WHERE rk <= $PqTopK
       |), hits AS (
       |  SELECT r.query_id, CAST(count(*) AS BIGINT) AS n_hits
       |  FROM rr_top r JOIN exact e
       |    ON r.query_id = e.query_id AND r.neighbor_id = e.neighbor_id
       |  GROUP BY 1
       |)
       |SELECT q.query_id,
       |       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       |       CAST(COALESCE(h.n_hits, 0) * ${10000 / PqTopK} AS BIGINT)
       |         AS recall_bp
       |FROM (SELECT vec_id AS query_id FROM qv WHERE vec_id < $PqNQ) q
       |LEFT JOIN hits h USING (query_id)
       |ORDER BY query_id""".stripMargin

  // ---- RAG context assembly: retrieve -> join -> budget-truncate ----
  // The composition a retrieval-augmented pipeline runs per query batch:
  // top-k neighbors for each query embedding, joined to the document
  // store, packed into a fixed context-window budget in similarity order
  // (truncate-at-budget: keep while the running char total fits — the
  // standard context-assembly rule). One DAG, no collect.
  //
  // Scale shape: queries broadcast, the corpus streams through the scored
  // projection (bruteForceTopK's crossJoin(broadcast(q)) — no corpus
  // shuffle); the doc join moves only Q*k retrieved rows to the
  // documents side, and the packing window partitions by query. At
  // 100 TB run `pipe_rag_ann` below — the same assembly stages with the
  // retrieve swapped for the persisted-PQ-index ADC probe, oracle-gated
  // like this one.
  private val RagK = 8
  private val RagBudget = 2000L

  def pipeRag(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, d)
    val hits = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), emb,
      k = RagK)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
    val w = Window.partitionBy("query_id").orderBy("rank")
    hits.join(docs, hits("neighbor_id") === docs("doc_id"))
      .withColumn("cum_chars", sum("n_chars").over(w))
      .filter(col("cum_chars") <= RagBudget)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"),
        col("n_chars"), col("cum_chars"))
      .orderBy("query_id", "rank")
  }

  val pipeRagSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
       |           FROM embeddings WHERE vec_id < 10),
       |     c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    list_sum(list_transform(range(1, len(qe)+1),
       |                            i -> qe[i]::DOUBLE * ce[i]::DOUBLE)) /
       |    nullif(sqrt(list_sum(list_transform(range(1, len(qe)+1),
       |                            i -> qe[i]::DOUBLE * qe[i]::DOUBLE))) *
       |     sqrt(list_sum(list_transform(range(1, len(ce)+1),
       |                            i -> ce[i]::DOUBLE * ce[i]::DOUBLE))), 0) AS score
       |  FROM q, c WHERE query_id <> neighbor_id
       |), hits AS (
       |  SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
       |         round(score, 4) AS score
       |  FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY score DESC, neighbor_id) AS rank
       |    FROM scored
       |  ) WHERE rank <= $RagK
       |), packed AS (
       |  SELECT h.query_id, h.rank, d.doc_id, h.score,
       |         CAST(len(d.text) AS BIGINT) AS n_chars,
       |         CAST(sum(len(d.text)) OVER (PARTITION BY h.query_id
       |               ORDER BY h.rank ROWS BETWEEN UNBOUNDED PRECEDING
       |               AND CURRENT ROW) AS BIGINT) AS cum_chars
       |  FROM hits h JOIN documents d ON h.neighbor_id = d.doc_id
       |)
       |SELECT * FROM packed WHERE cum_chars <= $RagBudget
       |ORDER BY query_id, rank""".stripMargin

  // ---- RAG assembly on the persisted ANN index ----
  // The certified 100 TB retrieval path pipe_rag's scaladoc promises:
  // identical assembly stages (doc join → budget-truncate in rank order),
  // retrieve swapped from brute-force cosine to the integer ADC probe
  // against the BUILT-ONCE PQ index — per query batch the corpus never
  // moves (broadcast distance table + one (m, code) equi-join), so the
  // composition serves at any corpus size. Oracle embeds the PQ chain
  // verbatim (the sim_pq_recall doctrine): the RAG gate certifies the
  // exact retrieve it ships, not a lookalike.
  def pipeRagAnn(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (cent, codes) = pqIndex(s, d)
    val qcells = pqCells(pqQuantize(
      Tables.embeddings(s, d).filter(col("vec_id") < PqNQ)))
    // retrieve RagK deep — the same candidate depth pipe_rag assembles
    // from, so the two pipelines differ ONLY in the retrieve stage
    val hits = pqProbe(qcells, cent, codes, RagK)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
    val w = Window.partitionBy("query_id").orderBy("rank")
    hits.join(docs, hits("neighbor_id") === docs("doc_id"))
      .withColumn("cum_chars", sum("n_chars").over(w))
      .filter(col("cum_chars") <= RagBudget)
      .select(col("query_id"), col("rank"), col("doc_id"), col("adc_dist"),
        col("n_chars"), col("cum_chars"))
      .orderBy("query_id", "rank")
  }

  val pipeRagAnnSql: String =
    s"""WITH $pqSqlChain,
       |rag_top AS (
       |  SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, adc_dist
       |  FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY adc_dist, neighbor_id) AS rank
       |    FROM adc
       |  ) WHERE rank <= $RagK
       |),
       |packed AS (
       |  SELECT p.query_id, p.rank, d.doc_id, p.adc_dist,
       |         CAST(len(d.text) AS BIGINT) AS n_chars,
       |         CAST(sum(len(d.text)) OVER (PARTITION BY p.query_id
       |               ORDER BY p.rank ROWS BETWEEN UNBOUNDED PRECEDING
       |               AND CURRENT ROW) AS BIGINT) AS cum_chars
       |  FROM rag_top p JOIN documents d ON p.neighbor_id = d.doc_id
       |)
       |SELECT * FROM packed WHERE cum_chars <= $RagBudget
       |ORDER BY query_id, rank""".stripMargin

  // ---- IVF-PQ: coarse inverted lists + residual product quantization ----
  // The composition production ANN systems actually deploy at 100 TB
  // (Jégou 2011 §V, the Faiss IVFPQ shape): a coarse k-means partitions
  // the corpus into inverted lists; each vector stores only its cell id
  // and the PQ codes of its RESIDUAL (vector minus cell centroid —
  // residuals concentrate near zero, so the same codebook budget
  // quantizes them better); a query probes its IvfProbe nearest cells
  // and runs integer ADC against those cells' codes ONLY. Search cost
  // scales with nprobe/KmK of the corpus, not the corpus — the
  // partition-pruning this engine applies to scans, applied to ANN.
  //
  // Everything is integer (2^20-grid vectors, truncating-div Lloyd's,
  // integer residuals, integer ADC), so both engines rank
  // bit-identically. The index (coarse centroids + residual codebooks +
  // codes) is a BUILT-ONCE staged artifact keyed by Scratch.digest; the
  // probe is the measured query. Scale shape per stage: coarse training
  // touches only the bounded PqTrainN sample; full-corpus assignment and
  // encoding are broadcast-join passes; the probe joins a broadcast
  // Q×nprobe×PqM×PqK distance table against codes on (cid, m, code) —
  // the join key IS the inverted-list prune.
  // nprobe and the coarse cell count are RUNTIME confs (the
  // spark.graft.shards template): the oracle SQL pins the defaults, so
  // Verify fails fast on non-default values (graft.OracleDefaults);
  // production tunes nprobe per recall budget and cells per corpus size
  // without touching code. nprobe never enters a staged-index key (the
  // index is nprobe-independent — that IS the knob's point); the cell
  // count trains a different coarse quantizer, so it IS part of the key.
  private val IvfProbeDefault = 2
  private val IvfCellsDefault = KmK // 8 — shared default with emb_kmeans

  /** Cells probed per query — `spark.graft.ivf.nprobe`, default 2. */
  private[graft] def ivfNprobe(s: SparkSession): Int = {
    val n = s.conf.get("spark.graft.ivf.nprobe", IvfProbeDefault.toString).toInt
    require(n >= 1 && n <= ivfCells(s),
      s"spark.graft.ivf.nprobe must be in [1, cells=${ivfCells(s)}], got $n")
    n
  }

  /** Coarse cell count — `spark.graft.ivf.cells`, default 8. */
  private[graft] def ivfCells(s: SparkSession): Int = {
    val k = s.conf.get("spark.graft.ivf.cells", IvfCellsDefault.toString).toInt
    require(k >= 1, s"spark.graft.ivf.cells must be positive, got $k")
    k
  }

  /** Nearest coarse cell per quantized vector — broadcast the ≤cells-row
    * centroid table, ties to the lowest cid (the emb_kmeans struct-min).
    */
  private def ivfArgminCell(qv: DataFrame, coarse: DataFrame): DataFrame =
    qv.crossJoin(broadcast(coarse))
      .withColumn("dist", distL2(col("q"), col("cvec")))
      .groupBy("vec_id")
      .agg(min(struct(col("dist"), col("cid"))).as("mm"))
      .select(col("vec_id"), col("mm.cid").as("cid"))

  /** Per-subspace (vec_id, cid, m, sub) rows of integer residuals. */
  private def ivfResidCells(resid: DataFrame): DataFrame =
    resid.select(col("vec_id"), col("cid"),
        explode(sequence(lit(0), lit(PqM - 1))).as("m"), col("r"))
      .select(col("vec_id"), col("cid"), col("m"),
        slice(col("r"), col("m") * PqSub + 1, lit(PqSub)).as("sub"))

  /** Nearest residual-codebook code per (vec, subspace). */
  private def ivfArgminCode(cells: DataFrame, rcent: DataFrame): DataFrame =
    cells.join(broadcast(rcent), "m")
      .withColumn("dist", distL2(col("sub"), col("cvec")))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("dist"), col("code"))).as("mm"))
      .select(col("vec_id"), col("m"), col("mm.code").as("code"))

  /** Encode raw (vec_id, embedding) rows against a FROZEN index —
    * coarse assignment, integer residual, residual-codebook codes. This
    * is the whole per-vector half of the index pipeline as one pure
    * function: index build, incremental append ([[mergeIvfpqCodes]]),
    * and the rebuild side of the maintenance-parity specs all run
    * through it, so "append ≡ rebuild" holds by construction and is
    * still spec-asserted.
    */
  private[graft] def ivfpqEncode(vecs: DataFrame, coarse: DataFrame,
                                 rcent: DataFrame): DataFrame = {
    val qv = pqQuantize(vecs)
    val resid = ivfArgminCell(qv, coarse).join(qv, "vec_id")
      .join(broadcast(coarse), "cid")
      .select(col("vec_id"), col("cid"),
        zip_with(col("q"), col("cvec"), (x, y) => x - y).as("r"))
    ivfArgminCode(ivfResidCells(resid), rcent)
      .join(resid.select("vec_id", "cid"), "vec_id")
      .select("vec_id", "cid", "m", "code")
  }

  /** The persisted IVF-PQ index: (coarse centroids (cid, cvec),
    * residual codebooks (m, code, cvec), codes (vec_id, cid, m, code)).
    */
  private[graft] def ivfpqIndex(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = ivfpqIndexOn(s, d, None)

  /** [[ivfpqIndex]] restricted to a base corpus prefix: `baseBound =
    * Some(n)` trains AND encodes only `vec_id < n` — the historical
    * corpus of the incremental-ingest loop ([[simIvfpqIncr]]), whose
    * later batches fold in against the frozen quantizers.
    */
  private[graft] def ivfpqIndexOn(s: SparkSession, d: String,
                                  baseBound: Option[Long])
      : (DataFrame, DataFrame, DataFrame) = {
    // the cell count shapes the trained index, so it keys the staged
    // artifacts; nprobe deliberately does NOT (same index, shallower probe)
    val tag = graft.Scratch.digest(d) + s"_c${ivfCells(s)}" +
      baseBound.fold("")(b => s"_b$b")
    val corpus = baseBound.fold(Tables.embeddings(s, d))(b =>
      Tables.embeddings(s, d).filter(col("vec_id") < b))
    ivfpqBuild(s, corpus, tag)
  }

  /** The full index-TRAINING pipeline over an arbitrary corpus frame —
    * coarse k-means, residual codebooks, corpus encode — shared by the
    * path-based [[ivfpqIndexOn]] and by [[rotateIvfpqIndex]] (which
    * retrains on a maintained store's served view minus tombstones, a
    * corpus no path filter can express). `tag` keys the staged
    * artifacts and must be a pure function of (corpus identity, cell
    * count): callers are responsible for that, or two builds would
    * cross-wire their memoized stages.
    */
  private def ivfpqBuild(s: SparkSession, corpus: DataFrame, tag: String)
      : (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val nCells = ivfCells(s)
    def stage(c: => DataFrame, name: String): DataFrame =
      graft.Scratch.stagedFrame(s, s"ivfpq_${name}_$tag")(c)

    val qv = stage(pqQuantize(corpus), "qv")
    val tv = qv.filter(col("vec_id") < PqTrainN)

    // coarse k-means over the bounded training sample: nCells cells,
    // KmIters truncating-div Lloyd's rounds. Init is LABEL-STRATIFIED
    // hash-ranked seeds — the same de-leaked recipe as the flat-PQ
    // codebooks (round-8 study: lowest-id init draws its seeds from the
    // vec_id order that overlaps the vec_id<PqNQ eval window); cell
    // assignment is second-order for recall but the one init family
    // keeps the whole ANN tier honest-eval by construction.
    val wCSeed = Window.partitionBy("label").orderBy("hs", "vec_id")
    val cseeds = corpus.filter(col("vec_id") < PqTrainN)
      .select(col("vec_id"), col("label"),
        md5(concat(lit("ivfcseed|"), col("vec_id").cast("string"))).as("hs"))
      .withColumn("rl", row_number().over(wCSeed))
      .orderBy("rl", "label").limit(nCells).select("vec_id")
    var coarse = stage(
      tv.join(cseeds, "vec_id")
        .select((row_number().over(Window.orderBy("vec_id")) - 1)
          .cast("long").as("cid"), col("q").as("cvec")), "coarse_0")
    for (i <- 1 to KmIters) {
      coarse = stage(
        ivfArgminCell(tv, coarse).join(tv, "vec_id")
          .select(col("cid"), posexplode(col("q")).as(Seq("pos", "x")))
          .groupBy("cid", "pos")
          .agg(sum("x").as("sx"), count(lit(1)).as("n"))
          .select(col("cid"), col("pos"),
            (when(col("sx") < 0, -1L).otherwise(1L) *
              expr("abs(sx) div n")).as("cx"))
          .groupBy("cid")
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
            p => p.getField("cx")).as("cvec")), s"coarse_$i")
    }

    // full-corpus cell assignment + integer residuals
    val resid = stage(
      ivfArgminCell(qv, coarse).join(qv, "vec_id")
        .join(broadcast(coarse), "cid")
        .select(col("vec_id"), col("cid"),
          zip_with(col("q"), col("cvec"), (x, y) => x - y).as("r")), "resid")

    val cells = stage(ivfResidCells(resid), "rcells")
    val tcells = cells.filter(col("vec_id") < PqTrainN)

    // residual codebooks: hash-ranked seed spread over the training
    // residuals (residual space is centered, no strata to cover), then
    // PqIters Lloyd's rounds — the pqIndex recipe on residuals
    val seeds = resid.filter(col("vec_id") < PqTrainN)
      .select(col("vec_id"),
        md5(concat(lit("ivfpqseed|"), col("vec_id").cast("string"))).as("hs"))
      .orderBy("hs", "vec_id").limit(PqK).select("vec_id")
    var rcent = stage(
      tcells.join(seeds, "vec_id")
        .withColumn("code", (row_number().over(
          Window.partitionBy("m").orderBy("vec_id")) - 1).cast("long"))
        .select(col("m"), col("code"), col("sub").as("cvec")), "rcent_0")
    for (i <- 1 to PqIters) {
      rcent = stage(
        ivfArgminCode(tcells, rcent).join(tcells, Seq("vec_id", "m"))
          .select(col("m"), col("code"), posexplode(col("sub")).as(Seq("pos", "x")))
          .groupBy("m", "code", "pos")
          .agg(sum("x").as("sx"), count(lit(1)).as("n"))
          .select(col("m"), col("code"), col("pos"),
            (when(col("sx") < 0, -1L).otherwise(1L) *
              expr("abs(sx) div n")).as("cx"))
          .groupBy("m", "code")
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
            p => p.getField("cx")).as("cvec")), s"rcent_$i")
    }

    // encode the full corpus — (vec_id, cid, PqM codes) IS the index.
    // Staged PARTITIONED BY the coarse cell id: the probe's equi-join on
    // cid then prunes the SCAN via dynamic partition pruning (only the
    // nprobe probed cells' files are read), not just the join — without
    // the layout, "inverted lists" would still read 100% of the codes at
    // every probe and stop being inverted at 100 TB.
    val codes = graft.Scratch.stagedFramePartitioned(
      s, s"ivfpq_codes_$tag", Seq("cid"))(
      ivfArgminCode(cells, rcent)
        .join(resid.select("vec_id", "cid"), "vec_id")
        .select("vec_id", "cid", "m", "code"))
    (coarse, rcent, codes)
  }

  /** Index maintenance: fold a new embedding batch into a persisted
    * IVF-PQ code table WITHOUT retraining — the coarse quantizer and
    * residual codebooks are FROZEN, the batch is [[ivfpqEncode]]d against
    * them, and its rows append (the `TextDedup.mergeBandIndex` contract
    * brought to the ANN tier). `replaceExisting = true` upserts
    * re-ingested vec_ids (batch id set broadcasts — batches are small at
    * any corpus scale); `false` is the pure-append crawl-ingest shape:
    * partition appends to the cid layout plus an occasional
    * `Sinks.compactParquet`, never a corpus rewrite. Because codes are a
    * pure per-vector function of the frozen quantizers, the merged table
    * is row-identical to encoding (corpus ∖ replaced) ∪ batch in one
    * pass — spec-asserted (AnnMaintenanceSpec) and value-certified by
    * the `sim_ivfpq_incr` oracle, whose DuckDB side IS the one-pass
    * rebuild. What maintenance deliberately does NOT do is fold the
    * batch into codebook training: quantizer refresh is a scheduled
    * re-index (the Faiss operational shape), not a per-batch event.
    */
  private[graft] def mergeIvfpqCodes(codes: DataFrame, batch: DataFrame,
                                     coarse: DataFrame, rcent: DataFrame,
                                     replaceExisting: Boolean = true)
      : DataFrame = {
    val bCodes = ivfpqEncode(batch, coarse, rcent)
    val kept =
      if (replaceExisting)
        codes.join(broadcast(batch.select("vec_id").distinct()),
          Seq("vec_id"), "left_anti")
      else codes
    kept.unionByName(bCodes)
  }

  /** Right-to-be-forgotten pass over the persisted code table: drop
    * every code row of the given vec_ids (broadcast anti-join — the
    * delete set is small at any corpus scale; on the cid-partitioned
    * layout this rewrites only partitions that contain deleted rows).
    * Per-vector DATA is gone; the codebooks are aggregate statistics
    * (like any trained model) and rotate on the scheduled re-index, not
    * per deletion. Post-delete the table is row-identical to encoding
    * corpus ∖ deleted against the same frozen quantizers
    * (AnnMaintenanceSpec), and `sim_ivfpq_del` oracle-certifies that a
    * deleted vector can never be retrieved.
    */
  private[graft] def deleteFromCodes(codes: DataFrame,
                                     deleteIds: DataFrame): DataFrame =
    codes.join(broadcast(deleteIds.select("vec_id").distinct()),
      Seq("vec_id"), "left_anti")

  /** The eval/query vector batch as its OWN staged artifact (one tiny
    * parquet, memoized per (session, d, n)). Two reasons, both the
    * production shape: (1) query batches ARRIVE as small inputs (the
    * streaming `foreachBatch` frame is exactly this) — they are never a
    * filter over the 100 TB corpus file; (2) the planner's size
    * estimate for `corpus.filter(vec_id < n)` is the corpus FILE size,
    * which poisons every downstream decision sized from the probe side
    * — most consequentially dynamic partition pruning's
    * `pruningHasBenefit`, whose overhead estimate is the filtering
    * plan's size: with the filter-over-corpus shape it concludes the
    * pruning subquery costs ~a corpus scan and declines, and the
    * cid-partitioned code store stops pruning I/O at exactly the scale
    * it exists for (measured: 64/64 cell files read at the 100× rung;
    * 2/64 once the batch is staged — DppCheck, BENCH_NOTES round 10).
    */
  private[graft] def queryBatch(s: SparkSession, d: String, n: Long)
      : DataFrame =
    graft.Scratch.stagedFrame(s, s"qbatch_${graft.Scratch.digest(d)}_$n")(
      Tables.embeddings(s, d).filter(col("vec_id") < n))

  /** IVF-PQ top-k for a batch of raw (vec_id, embedding) query rows —
    * the per-batch serving path shared by batch `sim_ivfpq` and the
    * streaming twin ([[graft.streaming.AnnStream.ivfpqProbeStream]]).
    * Pure function of (query rows, index): no cross-batch state.
    */
  private[graft] def ivfpqProbe(queries: DataFrame, coarse: DataFrame,
                                rcent: DataFrame, codes: DataFrame,
                                topK: Int = PqTopK): DataFrame =
    ivfpqProbeFrom(queries, coarse, rcent, _ => codes, topK)

  /** [[ivfpqProbe]] with the code table supplied AS A FUNCTION of the
    * probed cells (one small `cid` frame, nprobe rows per query) — the
    * maintained-store serving shape: the store queries pass
    * `cells => KeyedStore.serve(..., partPrune = Some(cells))`, which
    * semi-joins each leg of the store reconcile to the probed cells
    * BEFORE the union so the compacted hive half prunes BY
    * CONSTRUCTION even while the store has churn (a pending batch or
    * live tombstone — its steady state). Measured honestly
    * (StoreDppCheck): this Spark's DPP often reaches the scan through
    * the plain reconcile too; the explicit geometry is what makes the
    * prune guaranteeable and spec-lockable (IvfConfSpec non-quiesced
    * scan-metrics test) rather than a cost-model outcome.
    * Result-identical to probing the full serve: the ADC join below
    * only ever touches the probed cells' rows anyway.
    */
  private[graft] def ivfpqProbeFrom(queries: DataFrame, coarse: DataFrame,
                                    rcent: DataFrame,
                                    codesFor: DataFrame => DataFrame,
                                    topK: Int = PqTopK): DataFrame = {
    val (cells, dt) = ivfpqQueryFrames(queries, coarse, rcent)
    adcTopK(adcCandidates(codesFor(cells), dt), topK)
  }

  /** The query-side frames of an IVF-PQ probe, computed once per query
    * batch: the probed cells (one `cid` frame, nprobe rows per query —
    * the partPrune hand-off) and the per-(query, cell, subspace, code)
    * ADC distance table. Pure functions of (queries, quantizers) — the
    * streaming decontamination twin stages `dt` at stream definition
    * and reuses it every micro-batch ([[graft.streaming.DeconStream]]).
    */
  private[graft] def ivfpqQueryFrames(queries: DataFrame, coarse: DataFrame,
                                      rcent: DataFrame)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val qq = pqQuantize(queries)
    val probes = qq.crossJoin(broadcast(coarse))
      .withColumn("cd", distL2(col("q"), col("cvec")))
      .withColumn("pr", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cd"), col("cid"))))
      .filter(col("pr") <= ivfNprobe(queries.sparkSession))
      .select(col("vec_id").as("query_id"), col("cid"),
        zip_with(col("q"), col("cvec"), (x, y) => x - y).as("rq"))
    val qcells = probes
      .select(col("query_id"), col("cid"),
        explode(sequence(lit(0), lit(PqM - 1))).as("m"), col("rq"))
      .select(col("query_id"), col("cid"), col("m"),
        slice(col("rq"), col("m") * PqSub + 1, lit(PqSub)).as("sub"))
    val dt = qcells.join(broadcast(rcent), "m")
      .select(col("query_id"), col("cid"), col("m"), col("code"),
        distL2(col("sub"), col("cvec")).as("dcode"))
    (probes.select("cid"), dt)
  }

  /** Integer ADC distances of a code-table slice against a probe's
    * distance tables — one row per (query, candidate vector) whose cell
    * the query probed. Each candidate's sum is complete within the code
    * rows of that vector, so per-micro-batch candidate sets union to
    * the full batch probe's exactly (the streaming-twin contract).
    */
  private[graft] def adcCandidates(codes: DataFrame, dt: DataFrame): DataFrame =
    codes.join(broadcast(dt), Seq("cid", "m", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy("query_id", "vec_id")
      .agg(sum("dcode").as("adc_dist"))

  /** Top-k per query over ADC candidates, the probe's deterministic tail
    * (ties to the smaller vector id). Distributive over candidate-set
    * union: top-k of unioned per-batch candidates ≡ top-k of the one-shot
    * probe.
    */
  private[graft] def adcTopK(cands: DataFrame, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    cands
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adc_dist"), col("vec_id")))
        .cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("adc_dist"))
  }

  /** IVF-PQ top-k: probe the IvfProbe nearest coarse cells, integer ADC
    * on residuals against those cells' codes only.
    */
  def simIvfpq(s: SparkSession, d: String): DataFrame = {
    val (coarse, rcent, codes) = ivfpqIndex(s, d)
    ivfpqProbe(queryBatch(s, d, PqNQ),
      coarse, rcent, codes)
      .orderBy("query_id", "rank")
  }

  /** The full IVF-PQ oracle chain as a WITH body ending in `ivf_top`
    * (query_id, rank, neighbor_id, adc_dist) — shared verbatim by
    * `sim_ivfpq` and `sim_ivfpq_recall` (the sim_pq_recall doctrine).
    * `trainN` bounds BOTH quantizers' training (and their seed draws) to
    * `vec_id < trainN` — the incremental-ingest oracle trains on the
    * base prefix while still encoding the full corpus, which makes the
    * oracle the one-pass REBUILD that `sim_ivfpq_incr`'s maintained
    * index must match. `codesWhere` filters the encoded code table —
    * the post-delete oracle for `sim_ivfpq_del`. `nq` bounds the probe's
    * query set (`vec_id < nq`) — semantic decontamination probes with
    * the eval-set embeddings instead of the standard PqNQ window.
    * `trainPred` (default `vec_id < trainN`) generalizes the training
    * bound to an arbitrary predicate — the quantizer-ROTATION oracle
    * retrains on the training window minus the forgotten ids, a set no
    * prefix can express.
    */
  private def ivfpqSqlChain(trainN: Int = PqTrainN,
                            codesWhere: String = "TRUE",
                            nq: Int = PqNQ,
                            trainPred: Option[String] = None): String = {
    val pred = trainPred.getOrElse(s"vec_id < $trainN")
    val dist =
      """list_sum(list_transform(range(1, len(q)+1),
        |            i -> (q[i] - cvec[i]) * (q[i] - cvec[i])))""".stripMargin
    val sdist =
      """list_sum(list_transform(range(1, len(sub)+1),
        |            i -> (sub[i] - cvec[i]) * (sub[i] - cvec[i])))""".stripMargin
    val coarseRounds = (1 to KmIters).map { i =>
      s"""casg$i AS (
         |  SELECT vec_id, cid, q FROM (
         |    SELECT t.vec_id, c.cid, t.q,
         |           row_number() OVER (PARTITION BY t.vec_id
         |                              ORDER BY $dist, c.cid) AS rk
         |    FROM tv t JOIN ccent${i - 1} c ON true)
         |  WHERE rk = 1
         |),
         |ccell$i AS (
         |  SELECT cid, unnest(range(1, len(q)+1)) AS pos, unnest(q) AS x
         |  FROM casg$i
         |),
         |ccent$i AS (
         |  SELECT cid, list(cx ORDER BY pos) AS cvec FROM (
         |    SELECT cid, pos,
         |           CAST(CASE WHEN sum(x) < 0 THEN -1 ELSE 1 END AS BIGINT)
         |             * (abs(sum(x)) // count(*)) AS cx
         |    FROM ccell$i GROUP BY cid, pos)
         |  GROUP BY cid
         |)""".stripMargin
    }.mkString(",\n")
    val residRounds = (1 to PqIters).map { i =>
      s"""rasg$i AS (
         |  SELECT vec_id, m, code, sub FROM (
         |    SELECT t.vec_id, t.m, ct.code, t.sub,
         |           row_number() OVER (PARTITION BY t.vec_id, t.m
         |                              ORDER BY $sdist, ct.code) AS rk
         |    FROM rtcells t JOIN rcent${i - 1} ct ON t.m = ct.m)
         |  WHERE rk = 1
         |),
         |rpos$i AS (
         |  SELECT m, code, unnest(range(1, len(sub)+1)) AS pos, unnest(sub) AS x
         |  FROM rasg$i
         |),
         |rcent$i AS (
         |  SELECT m, code, list(cx ORDER BY pos) AS cvec FROM (
         |    SELECT m, code, pos,
         |           CAST(CASE WHEN sum(x) < 0 THEN -1 ELSE 1 END AS BIGINT)
         |             * (abs(sum(x)) // count(*)) AS cx
         |    FROM rpos$i GROUP BY m, code, pos)
         |  GROUP BY m, code
         |)""".stripMargin
    }.mkString(",\n")
    s"""qv AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           x -> CAST(floor(CAST(x AS DOUBLE) * $PqScale.0) AS BIGINT)) AS q
       |  FROM embeddings
       |),
       |tv AS (SELECT * FROM qv WHERE $pred),
       |ccent0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
       |         q AS cvec
       |  FROM tv
       |  WHERE vec_id IN (
       |    SELECT vec_id FROM (
       |      SELECT vec_id, label,
       |             row_number() OVER (PARTITION BY label
       |               ORDER BY md5('ivfcseed|' || CAST(vec_id AS VARCHAR)),
       |                        vec_id) AS rl
       |      FROM embeddings WHERE $pred)
       |    ORDER BY rl, label LIMIT $IvfCellsDefault)
       |),
       |$coarseRounds,
       |asg AS (
       |  SELECT vec_id, cid, q FROM (
       |    SELECT e.vec_id, c.cid, e.q,
       |           row_number() OVER (PARTITION BY e.vec_id
       |                              ORDER BY $dist, c.cid) AS rk
       |    FROM qv e JOIN ccent$KmIters c ON true)
       |  WHERE rk = 1
       |),
       |resid AS (
       |  SELECT a.vec_id, a.cid,
       |         list_transform(range(1, len(a.q)+1),
       |           i -> a.q[i] - c.cvec[i]) AS r
       |  FROM asg a JOIN ccent$KmIters c ON a.cid = c.cid
       |),
       |rcells AS (
       |  SELECT vec_id, cid, m, r[m*$PqSub+1 : (m+1)*$PqSub] AS sub
       |  FROM resid, (SELECT unnest(range(0, $PqM)) AS m)
       |),
       |rtcells AS (SELECT * FROM rcells WHERE $pred),
       |rcent0 AS (
       |  SELECT m,
       |         CAST(row_number() OVER (PARTITION BY m ORDER BY vec_id) - 1
       |              AS BIGINT) AS code,
       |         sub AS cvec
       |  FROM rtcells
       |  WHERE vec_id IN (SELECT vec_id FROM resid WHERE $pred
       |                   ORDER BY md5('ivfpqseed|' || CAST(vec_id AS VARCHAR)),
       |                            vec_id LIMIT $PqK)
       |),
       |$residRounds,
       |rcodes AS (
       |  SELECT vec_id, cid, m, code FROM (
       |    SELECT t.vec_id, t.cid, t.m, ct.code,
       |           row_number() OVER (PARTITION BY t.vec_id, t.m
       |                              ORDER BY $sdist, ct.code) AS rk
       |    FROM rcells t JOIN rcent$PqIters ct ON t.m = ct.m)
       |  WHERE rk = 1 AND ($codesWhere)
       |),
       |qprobe AS (
       |  SELECT query_id, cid,
       |         list_transform(range(1, len(q)+1), i -> q[i] - cvec[i]) AS rq
       |  FROM (
       |    SELECT e.vec_id AS query_id, c.cid, e.q, c.cvec,
       |           row_number() OVER (PARTITION BY e.vec_id
       |                              ORDER BY $dist, c.cid) AS pr
       |    FROM (SELECT * FROM qv WHERE vec_id < $nq) e
       |    JOIN ccent$KmIters c ON true)
       |  WHERE pr <= $IvfProbeDefault
       |),
       |qpcells AS (
       |  SELECT query_id, cid, m, rq[m*$PqSub+1 : (m+1)*$PqSub] AS sub
       |  FROM qprobe, (SELECT unnest(range(0, $PqM)) AS m)
       |),
       |ivf_dt AS (
       |  SELECT p.query_id, p.cid, ct.m, ct.code, $sdist AS dcode
       |  FROM qpcells p JOIN rcent$PqIters ct ON p.m = ct.m
       |),
       |ivf_adc AS (
       |  SELECT d.query_id, k.vec_id AS neighbor_id,
       |         CAST(sum(d.dcode) AS BIGINT) AS adc_dist
       |  FROM rcodes k
       |  JOIN ivf_dt d ON k.cid = d.cid AND k.m = d.m AND k.code = d.code
       |  WHERE k.vec_id <> d.query_id
       |  GROUP BY 1, 2
       |),
       |ivf_top AS (
       |  SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, adc_dist
       |  FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY adc_dist, neighbor_id) AS rank
       |    FROM ivf_adc
       |  ) WHERE rank <= $PqTopK
       |)""".stripMargin
  }

  val simIvfpqSql: String =
    s"""WITH ${ivfpqSqlChain()}
       |SELECT query_id, rank, neighbor_id, adc_dist
       |FROM ivf_top ORDER BY query_id, rank""".stripMargin

  /** Recall@5 of the cell-pruned IVF-PQ probe vs the exact integer-L2
    * top-5 — certifies what nprobe=2 of KmK=8 cells costs in recall.
    */
  def simIvfpqRecall(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ivf = simIvfpq(s, d).select("query_id", "neighbor_id")
    val qv = pqQuantize(Tables.embeddings(s, d))
    val qq = qv.filter(col("vec_id") < PqNQ)
    val exact = qv.select(col("vec_id").as("neighbor_id"), col("q").as("cq"))
      .crossJoin(broadcast(qq.select(col("vec_id").as("query_id"),
        col("q").as("qq"))))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        distL2(col("qq"), col("cq")).as("d2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d2"), col("neighbor_id"))))
      .filter(col("rk") <= PqTopK)
      .select("query_id", "neighbor_id")
    val hits = ivf.join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    qq.select(col("vec_id").as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_hits"))
      .select(col("query_id"), col("n_hits"),
        (col("n_hits") * lit(10000L / PqTopK)).cast("long").as("recall_bp"))
      .orderBy("query_id")
  }

  /** IVF-PQ shortlist + exact rerank: ADC ranks a PqR-deep shortlist
    * WITHIN the probed cells, exact integer-L2 re-ranks it — completing
    * the serving matrix (flat PQ / flat PQ+rerank / IVF-PQ /
    * IVF-PQ+rerank). The recall eval certifies the decomposition of the
    * two loss sources: rerank recovers the residual-ADC ordering error;
    * what remains unrecovered is exactly the cell-pruning miss (true
    * neighbors outside the nprobe cells), which no rerank can see.
    */
  def simIvfpqRerank(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (coarse, rcent, codes) = ivfpqIndex(s, d)
    val qv = pqQuantize(Tables.embeddings(s, d))
    val qq = qv.filter(col("vec_id") < PqNQ)
    val short = ivfpqProbe(queryBatch(s, d, PqNQ),
        coarse, rcent, codes, PqR)
      .select(col("query_id"), col("neighbor_id"))
    qv.select(col("vec_id").as("neighbor_id"), col("q").as("cq"))
      .join(broadcast(short.join(
        qq.select(col("vec_id").as("query_id"), col("q").as("qq")),
        "query_id")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        distL2(col("qq"), col("cq")).as("d2"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d2"), col("neighbor_id")))
        .cast("long"))
      .filter(col("rank") <= PqTopK)
      .select("query_id", "rank", "neighbor_id", "d2")
      .orderBy("query_id", "rank")
  }

  /** Shortlist + rerank CTEs appended to [[ivfpqSqlChain]], shared by
    * `sim_ivfpq_rerank` and `sim_ivfpq_rr_recall`.
    */
  private def ivfRerankSqlChain: String =
    s"""ivf_short AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY adc_dist, neighbor_id) AS rk
       |    FROM ivf_adc) WHERE rk <= $PqR
       |),
       |ivf_rr AS (
       |  SELECT s.query_id, s.neighbor_id,
       |         CAST(list_sum(list_transform(range(1, len(q.q)+1),
       |              i -> (q.q[i] - c.q[i]) * (q.q[i] - c.q[i]))) AS BIGINT)
       |           AS d2
       |  FROM ivf_short s
       |  JOIN qv q ON q.vec_id = s.query_id
       |  JOIN qv c ON c.vec_id = s.neighbor_id
       |),
       |ivf_rr_top AS (
       |  SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, d2
       |  FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY d2, neighbor_id) AS rank
       |    FROM ivf_rr
       |  ) WHERE rank <= $PqTopK
       |)""".stripMargin

  val simIvfpqRerankSql: String =
    s"""WITH ${ivfpqSqlChain()},
       |$ivfRerankSqlChain
       |SELECT query_id, rank, neighbor_id, d2
       |FROM ivf_rr_top ORDER BY query_id, rank""".stripMargin

  /** Recall@5 of the cell-pruned + reranked probe vs the exact top-5. */
  def simIvfpqRrRecall(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rr = simIvfpqRerank(s, d).select("query_id", "neighbor_id")
    val qv = pqQuantize(Tables.embeddings(s, d))
    val qq = qv.filter(col("vec_id") < PqNQ)
    val exact = qv.select(col("vec_id").as("neighbor_id"), col("q").as("cq"))
      .crossJoin(broadcast(qq.select(col("vec_id").as("query_id"),
        col("q").as("qq"))))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        distL2(col("qq"), col("cq")).as("d2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d2"), col("neighbor_id"))))
      .filter(col("rk") <= PqTopK)
      .select("query_id", "neighbor_id")
    val hits = rr.join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    qq.select(col("vec_id").as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_hits"))
      .select(col("query_id"), col("n_hits"),
        (col("n_hits") * lit(10000L / PqTopK)).cast("long").as("recall_bp"))
      .orderBy("query_id")
  }

  val simIvfpqRrRecallSql: String =
    s"""WITH ${ivfpqSqlChain()},
       |$ivfRerankSqlChain,
       |exact AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT qy.vec_id AS query_id, c.vec_id AS neighbor_id,
       |           row_number() OVER (PARTITION BY qy.vec_id ORDER BY
       |             list_sum(list_transform(range(1, len(qy.q)+1),
       |               i -> (qy.q[i] - c.q[i]) * (qy.q[i] - c.q[i]))),
       |             c.vec_id) AS rk
       |    FROM (SELECT * FROM qv WHERE vec_id < $PqNQ) qy, qv c
       |    WHERE c.vec_id <> qy.vec_id)
       |  WHERE rk <= $PqTopK
       |), hits AS (
       |  SELECT r.query_id, CAST(count(*) AS BIGINT) AS n_hits
       |  FROM ivf_rr_top r JOIN exact e
       |    ON r.query_id = e.query_id AND r.neighbor_id = e.neighbor_id
       |  GROUP BY 1
       |)
       |SELECT q.query_id,
       |       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       |       CAST(COALESCE(h.n_hits, 0) * ${10000 / PqTopK} AS BIGINT)
       |         AS recall_bp
       |FROM (SELECT vec_id AS query_id FROM qv WHERE vec_id < $PqNQ) q
       |LEFT JOIN hits h USING (query_id)
       |ORDER BY query_id""".stripMargin

  val simIvfpqRecallSql: String =
    s"""WITH ${ivfpqSqlChain()},
       |exact AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT qy.vec_id AS query_id, c.vec_id AS neighbor_id,
       |           row_number() OVER (PARTITION BY qy.vec_id ORDER BY
       |             list_sum(list_transform(range(1, len(qy.q)+1),
       |               i -> (qy.q[i] - c.q[i]) * (qy.q[i] - c.q[i]))),
       |             c.vec_id) AS rk
       |    FROM (SELECT * FROM qv WHERE vec_id < $PqNQ) qy, qv c
       |    WHERE c.vec_id <> qy.vec_id)
       |  WHERE rk <= $PqTopK
       |), hits AS (
       |  SELECT v.query_id, CAST(count(*) AS BIGINT) AS n_hits
       |  FROM ivf_top v JOIN exact e
       |    ON v.query_id = e.query_id AND v.neighbor_id = e.neighbor_id
       |  GROUP BY 1
       |)
       |SELECT q.query_id,
       |       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       |       CAST(COALESCE(h.n_hits, 0) * ${10000 / PqTopK} AS BIGINT)
       |         AS recall_bp
       |FROM (SELECT vec_id AS query_id FROM qv WHERE vec_id < $PqNQ) q
       |LEFT JOIN hits h USING (query_id)
       |ORDER BY query_id""".stripMargin

  // ---- maintenance served: incremental ingest + right-to-forget ----
  // The two lifecycle passes every production corpus store runs against
  // its persisted ANN index, each served and oracle-gated end-to-end.
  private val IncrBase = 400L
  private val DelMod = 7L
  private val DelRes = 3L

  /** Serve queries through a MAINTAINED index: the base corpus
    * (vec_id < IncrBase) builds the persisted index; the rest of the
    * corpus folds in as an ingest batch against the FROZEN quantizers
    * ([[mergeIvfpqCodes]], pure append — the dd_incremental doctrine on
    * the ANN tier). Per-batch cost: O(batch encode + probed cells),
    * never O(corpus). The DuckDB oracle trains on the base prefix and
    * encodes the full corpus in ONE pass — the oracle IS the rebuild,
    * so this gate value-certifies append ≡ rebuild, not just row counts.
    */
  def simIvfpqIncr(s: SparkSession, d: String): DataFrame = {
    val (coarse, rcent, baseCodes) = ivfpqIndexOn(s, d, Some(IncrBase))
    val batch = Tables.embeddings(s, d).filter(col("vec_id") >= IncrBase)
    val codes = mergeIvfpqCodes(baseCodes, batch, coarse, rcent,
      replaceExisting = false)
    ivfpqProbe(queryBatch(s, d, PqNQ),
      coarse, rcent, codes)
      .orderBy("query_id", "rank")
  }

  val simIvfpqIncrSql: String =
    s"""WITH ${ivfpqSqlChain(trainN = IncrBase.toInt)}
       |SELECT query_id, rank, neighbor_id, adc_dist
       |FROM ivf_top ORDER BY query_id, rank""".stripMargin

  /** Serve queries through the index AFTER a right-to-forget pass
    * ([[deleteFromCodes]]): a deterministic id set (vec_id ≡ DelRes mod
    * DelMod, ~1/7 of the corpus) is deleted, and the gate certifies no
    * deleted vector is ever retrieved — the property a GDPR audit
    * actually checks. The oracle filters the same ids out of its encoded
    * code table, i.e. it serves the rebuild-without-deleted.
    */
  def simIvfpqDel(s: SparkSession, d: String): DataFrame = {
    val (coarse, rcent, codes) = ivfpqIndex(s, d)
    val del = Tables.embeddings(s, d).select("vec_id")
      .filter(col("vec_id") % DelMod === DelRes)
    ivfpqProbe(queryBatch(s, d, PqNQ),
      coarse, rcent, deleteFromCodes(codes, del))
      .orderBy("query_id", "rank")
  }

  val simIvfpqDelSql: String =
    s"""WITH ${ivfpqSqlChain(codesWhere = s"NOT (vec_id % $DelMod = $DelRes)")}
       |SELECT query_id, rank, neighbor_id, adc_dist
       |FROM ivf_top ORDER BY query_id, rank""".stripMargin

  /** Serve queries through the MAINTAINED STORE after its full life:
    * ingest → compact → ingest → forget → replay — every row travels
    * the `graft.sources.KeyedStore` path the streaming twins
    * (`AnnStream.storeCodes`) serve in production, and the DuckDB
    * oracle is the one-pass encode of corpus ∖ forgotten against the
    * base-trained quantizers (the `sim_ivfpq_del` doctrine). This is
    * the lifecycle's CORRECTNESS gate: the mixed-tree read, the
    * replay reconcile (batch_0 physically resurrects forgotten rows
    * after the compaction folded it away), and the durable tombstones
    * all sit between the parquet and the probe here — a bug in any of
    * them hash-mismatches this row. The store is built ONCE per
    * (session, dataset) — a production store is a persisted artifact
    * serving many probes, not a per-query rebuild — so the first call
    * pays (and gate-certifies) the whole lifecycle and min-of-N bench
    * repeats time the serve+probe, the staged-index doctrine applied
    * to the maintained store. The build-once marker is the store dir
    * itself: `Scratch.dirFor` hands each session a fresh empty parent,
    * so existence ⇔ this session already ran the lifecycle.
    */
  /** Build-once guard for side-effectful store lifecycles: run `build`
    * if this (session, dir) hasn't completed one, stamping a `_built`
    * marker as the LAST step — bare directory existence is not enough
    * (a crash mid-lifecycle would leave a half-built store that every
    * later call silently serves); a markerless leftover is wiped and
    * rebuilt instead.
    */
  private[graft] def buildOnce(s: SparkSession, dir: String)(build: => Unit): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(dir, "_built")
    if (!fs.exists(marker)) {
      fs.delete(p, true)
      build
      fs.create(marker, true).close()
    }
  }

  def simIvfpqStore(s: SparkSession, d: String): DataFrame = {
    import graft.sources.KeyedStore
    val (coarse, rcent, baseCodes) = ivfpqIndexOn(s, d, Some(IncrBase))
    val schema = baseCodes.schema
    val dir = graft.Scratch.dirFor(s,
      s"ivfpq_store_${graft.Scratch.digest(d)}_c${ivfCells(s)}") + "/store"
    val emb = Tables.embeddings(s, d)
    buildOnce(s, dir) {
      def enc(even: Boolean) = ivfpqEncode(
        emb.filter(col("vec_id") >= IncrBase &&
          col("vec_id") % 2 === (if (even) 0 else 1)), coarse, rcent)
      baseCodes.write.mode("overwrite").parquet(s"$dir/base")
      enc(even = true).write.mode("overwrite").parquet(s"$dir/batch_0")
      KeyedStore.compact(s, dir, Seq("cid"), schema, "vec_id")
      enc(even = false).write.mode("overwrite").parquet(s"$dir/batch_1")
      KeyedStore.forget(s, dir, "vec_id",
        emb.select("vec_id").filter(col("vec_id") % DelMod === DelRes))
      // the replay: batch_0 re-lands AFTER the compaction folded its
      // rows and AFTER some of them were forgotten — its dir physically
      // carries forgotten vectors again, and serve() must never show them
      enc(even = true).write.mode("overwrite").parquet(s"$dir/batch_0")
    }
    // serve through the cell-pruned path: the probe's cells semi-join
    // each leg of the store reconcile, keeping the compacted hive half
    // DPP-prunable while the store has churn (this store sits
    // non-quiesced by construction — batch_0/batch_1 pending, a live
    // tombstone — exactly the steady state the prune exists for)
    ivfpqProbeFrom(queryBatch(s, d, PqNQ), coarse, rcent,
      cells => KeyedStore.serve(s, dir, Seq("cid"), schema, "vec_id",
        partPrune = Some(cells)))
      .orderBy("query_id", "rank")
  }

  val simIvfpqStoreSql: String =
    s"""WITH ${ivfpqSqlChain(trainN = IncrBase.toInt,
      codesWhere = s"NOT (vec_id % $DelMod = $DelRes)")}
       |SELECT query_id, rank, neighbor_id, adc_dist
       |FROM ivf_top ORDER BY query_id, rank""".stripMargin

  /** Quantizer ROTATION — the scheduled re-index `deleteFromCodes`'s
    * doc promises: retrain BOTH quantizer levels on the store's served
    * view minus tombstones (live corpus), re-encode it, and atomically
    * swap the store (`KeyedStore.replaceAll` — same two-rename dance as
    * compaction, so the store stays readable throughout and a crash
    * leaves the previous index recoverable). Tombstones are carried
    * minus retirement: the rotation made every delete physical, but
    * replays of PRE-rotation batches still need guarding until the
    * horizon passes. Operational contract (documented, spec-enforced
    * by convention not code): rotation changes the pure per-key
    * encode function, so the ingest stream's checkpoint must be reset
    * across a rotation — a pre-rotation batch replayed afterwards
    * would re-land rows encoded with the RETIRED quantizers, which the
    * latest-batch-wins reconcile would faithfully serve. Returns the
    * fresh (coarse centroids, residual codebooks) for the probe side.
    */
  private[graft] def rotateIvfpqIndex(s: SparkSession, storeDir: String,
                                      d: String,
                                      schema: org.apache.spark.sql.types.StructType,
                                      tag: String,
                                      retireHorizonMs: Option[Long] = None,
                                      nowMs: Long = System.currentTimeMillis())
      : (DataFrame, DataFrame) = {
    import graft.sources.KeyedStore
    // snapshot BEFORE serving the live view: ingest landing anywhere in
    // the serve → retrain → swap window must fail the swap loudly
    // (those rows would be stale-quantizer data in the rotated store)
    val snap = KeyedStore.flatSnapshot(s, storeDir, Seq("cid"))
    val live = KeyedStore.serve(s, storeDir, Seq("cid"), schema, "vec_id")
      .select("vec_id").distinct()
    val corpus = Tables.embeddings(s, d).join(live, Seq("vec_id"), "left_semi")
    val (coarse, rcent, codes) = ivfpqBuild(s, corpus, tag)
    // the staging tag IS the generation identity: the rotated store is
    // stamped with it, so a pre-rotation batch replayed afterwards (old
    // stamp or none) fails serve/compact loudly instead of re-landing
    // stale-quantizer rows — the checkpoint-reset contract in code
    KeyedStore.replaceAll(s, storeDir, Seq("cid"), codes, "vec_id",
      retireHorizonMs = retireHorizonMs, nowMs = nowMs,
      sinceSnapshot = Some(snap), newGeneration = Some(tag))
    (coarse, rcent)
  }

  /** Serve queries through the store AFTER a quantizer rotation: base
    * index (trained on vec_id < IncrBase) + full ingest + forget, then
    * [[rotateIvfpqIndex]] retrains both codebook levels on the live
    * corpus and re-encodes. The oracle retrains on the SAME set —
    * `trainPred` = training window minus forgotten ids — and encodes
    * corpus ∖ forgotten in one pass: rotation ≡ rebuild-on-live, gated
    * end to end (probe through `KeyedStore.serve` over the swapped
    * store). Completes the maintenance triad ingest/forget/rotate.
    */
  def simIvfpqRot(s: SparkSession, d: String): DataFrame = {
    import graft.sources.KeyedStore
    val (coarse0, rcent0, baseCodes) = ivfpqIndexOn(s, d, Some(IncrBase))
    val schema = baseCodes.schema
    val dir = graft.Scratch.dirFor(s,
      s"ivfpq_rotstore_${graft.Scratch.digest(d)}_c${ivfCells(s)}") + "/store"
    val emb = Tables.embeddings(s, d)
    val tag = graft.Scratch.digest(d) + s"_c${ivfCells(s)}_rot"
    // build-once per (session, dataset), the simIvfpqStore contract:
    // first call runs ingest → forget → ROTATE; repeats time the serve
    buildOnce(s, dir) {
      baseCodes.write.mode("overwrite").parquet(s"$dir/base")
      ivfpqEncode(emb.filter(col("vec_id") >= IncrBase), coarse0, rcent0)
        .write.mode("overwrite").parquet(s"$dir/batch_0")
      KeyedStore.forget(s, dir, "vec_id",
        emb.select("vec_id").filter(col("vec_id") % DelMod === DelRes))
      rotateIvfpqIndex(s, dir, d, schema, tag)
    }
    // the rotated quantizers are staged under `tag` — re-reading them
    // here (instead of threading the rotate return value) keeps the
    // repeat-call path identical to the first call's probe
    val live = KeyedStore.serve(s, dir, Seq("cid"), schema, "vec_id")
    val (coarse, rcent, _) = ivfpqBuild(s,
      emb.join(live.select("vec_id").distinct(), Seq("vec_id"), "left_semi"),
      tag)
    // probe through the ONE live serve frame, NOT a second cell-pruned
    // serve (the r12 shape): the rotated store is quiesced-plus-
    // tombstones at probe time — no flat legs, so the busy-store
    // partPrune guarantee isn't load-bearing here (sim_ivfpq_store owns
    // that drill) and DPP reaches this reconcile on its own
    // (StoreDppCheck's measured result). The r13 A/B (BENCH_NOTES)
    // measured the second-serve+prune shape at ~2.4 s vs ~1.9 s for
    // this one on the same machine hour — the r12 regression was that
    // shape, not machine band alone.
    ivfpqProbe(queryBatch(s, d, PqNQ), coarse, rcent, live)
      .orderBy("query_id", "rank")
  }

  val simIvfpqRotSql: String =
    s"""WITH ${ivfpqSqlChain(
      trainPred = Some(
        s"vec_id < $PqTrainN AND NOT (vec_id % $DelMod = $DelRes)"),
      codesWhere = s"NOT (vec_id % $DelMod = $DelRes)")}
       |SELECT query_id, rank, neighbor_id, adc_dist
       |FROM ivf_top ORDER BY query_id, rank""".stripMargin

  // ---- semantic decontamination through the persisted ANN index ----
  // The embedding-space sibling of dd_contaminate's n-gram overlap: a
  // benchmark's embeddings probe the SERVING index (IVF-PQ shortlist,
  // PqR deep), the shortlist alone is verified by exact integer-L2, and
  // corpus vectors within SemTau of any eval vector are flagged with
  // their closest eval id. This is how decontamination actually runs at
  // 100 TB — the eval set is tiny (broadcasts), the corpus is reached
  // only through the index's probed cells, and the exact pass touches
  // E×PqR rows. A pair the ANN shortlist misses is not flagged: that
  // recall trade-off is the operator's real contract (tune nprobe/PqR
  // against the certified recall curves), and the oracle runs the
  // IDENTICAL chain, so the gate certifies the pipeline, not a
  // brute-force idealization of it. SemTau sits at the ~0.1% quantile
  // of the eval-to-corpus exact-distance distribution (measured on
  // sf0.01: min 1.12e12, q0.001 1.36e12, median 2.20e12). Both knobs
  // are runtime confs (re-derive tau from that quantile when the
  // embedding space changes); the static oracle SQL pins the defaults,
  // so OracleDefaults fail-fasts a non-default value in the gate.
  private val SemEvalN = 25L
  private val SemTau = 1400000000000L
  private[graft] def semEvalN(s: SparkSession): Long =
    s.conf.get("spark.graft.sem.evaln", SemEvalN.toString).toLong
  private[graft] def semTau(s: SparkSession): Long =
    s.conf.get("spark.graft.sem.tau", SemTau.toString).toLong

  def ddContaminateSem(s: SparkSession, d: String): DataFrame = {
    val (coarse, rcent, codes) = ivfpqIndex(s, d)
    val evalN = semEvalN(s)
    val short = ivfpqProbe(queryBatch(s, d, evalN),
        coarse, rcent, codes, PqR)
      .filter(col("neighbor_id") >= evalN) // corpus side only
      .select(col("query_id").as("eval_id"), col("neighbor_id").as("vec_id"))
    semVerifyFlags(s, d, short).orderBy("vec_id")
  }

  /** The exact-verification tail of semantic decontamination, factored
    * so the batch query and its streaming twin
    * ([[graft.streaming.DeconStream.fusedVerdicts]]) share it verbatim:
    * the ANN shortlist's (eval, corpus vector) pairs are re-scored with
    * EXACT integer L2 (eval side broadcast — E·PqR rows), thresholded
    * at tau, and each flagged vector keeps its closest eval (ties to
    * the smaller eval id).
    */
  private[graft] def semVerifyFlags(s: SparkSession, d: String,
                                    short: DataFrame): DataFrame = {
    val qv = pqQuantize(Tables.embeddings(s, d))
    qv.select(col("vec_id"), col("q").as("cq"))
      .join(broadcast(short.join(
        qv.select(col("vec_id").as("eval_id"), col("q").as("qq")),
        "eval_id")), "vec_id")
      .select(col("vec_id"), col("eval_id"),
        distL2(col("qq"), col("cq")).as("d2"))
      .filter(col("d2") <= semTau(s))
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("eval_id"))).as("mm"))
      .select(col("vec_id"), col("mm.eval_id").as("eval_id"),
        col("mm.d2").as("d2"))
  }

  /** The shipped decontamination chain as CTEs ending in `sem_flags` —
    * shared VERBATIM by `dd_contaminate_sem` and its recall eval
    * `dd_sem_recall` (the dd_lsh_recall doctrine: an eval that embeds
    * anything but the shipped query certifies nothing).
    */
  private def semSqlChain: String =
    s"""${ivfpqSqlChain(nq = SemEvalN.toInt)},
       |$ivfRerankSqlChain,
       |sem_flags AS (
       |  SELECT vec_id, eval_id, d2 FROM (
       |    SELECT r.neighbor_id AS vec_id, r.query_id AS eval_id, r.d2,
       |           row_number() OVER (PARTITION BY r.neighbor_id
       |                              ORDER BY r.d2, r.query_id) AS rk2
       |    FROM ivf_rr r
       |    WHERE r.neighbor_id >= $SemEvalN AND r.d2 <= $SemTau)
       |  WHERE rk2 = 1
       |)""".stripMargin

  val ddContaminateSemSql: String =
    s"""WITH $semSqlChain
       |SELECT vec_id, eval_id, d2 FROM sem_flags ORDER BY vec_id""".stripMargin

  /** Recall of `dd_contaminate_sem` against EXACT truth — the one
    * approximate family that still lacked a certified recall row. Truth
    * is the brute-force pass the production shape exists to avoid: every
    * corpus vector's exact integer-L2 distance to every eval vector
    * (E-bounded — corpus × SemEvalN with the eval side broadcast, the
    * same shape as every other exact eval here), thresholded at SemTau.
    * The shipped query's flags are exact-verified, so flags ⊆ truth by
    * construction (n_flagged = n_hit; published anyway as the
    * cross-check) — what this row certifies is the MISS rate: vectors
    * inside tau whose eval pair the ANN shortlist never surfaced,
    * invisible to every downstream artifact. The oracle embeds the
    * shipped chain verbatim ([[semSqlChain]]), so the measured recall
    * itself is oracle-certified.
    */
  def ddSemRecall(s: SparkSession, d: String): DataFrame = {
    val evalN = semEvalN(s)
    val qv = pqQuantize(Tables.embeddings(s, d))
    val truth = qv.filter(col("vec_id") >= evalN)
      .select(col("vec_id"), col("q").as("cq"))
      .crossJoin(broadcast(qv.filter(col("vec_id") < evalN)
        .select(col("vec_id").as("eval_id"), col("q").as("qq"))))
      .filter(distL2(col("qq"), col("cq")) <= semTau(s))
      .select("vec_id").distinct()
    // NEGATIVE RESULT (optimization r14, measured): the shipped chain
    // feeds two counting branches of this one action and is planned
    // twice — but staging it to scratch first made the query SLOWER
    // (1.27 → 1.74 s isolated min-of-3 at sf0.1): the duplicate probe
    // subtrees read the STAGED ivfpq index and overlap on idle cores
    // inside one action, while the staging write is a serial barrier.
    // Left inline deliberately; the duplication is planned, not paid in
    // wall time.
    val flags = ddContaminateSem(s, d).select("vec_id")
    truth.join(flags.withColumn("hit", lit(1L)), Seq("vec_id"), "left")
      .agg(count(lit(1)).cast("long").as("n_true"),
        coalesce(sum("hit"), lit(0L)).cast("long").as("n_hit"))
      .crossJoin(broadcast(
        flags.agg(count(lit(1)).cast("long").as("n_flagged"))))
      .select(col("n_true"), col("n_flagged"), col("n_hit"),
        when(col("n_true") === 0L, lit(0L))
          .otherwise(expr("n_hit * 10000 div n_true")).cast("long")
          .as("recall_bp"))
  }

  val ddSemRecallSql: String =
    s"""WITH $semSqlChain,
       |sem_truth AS (
       |  SELECT DISTINCT c.vec_id
       |  FROM (SELECT * FROM qv WHERE vec_id >= $SemEvalN) c,
       |       (SELECT * FROM qv WHERE vec_id < $SemEvalN) e
       |  WHERE list_sum(list_transform(range(1, len(e.q)+1),
       |          i -> (e.q[i] - c.q[i]) * (e.q[i] - c.q[i]))) <= $SemTau
       |)
       |SELECT CAST((SELECT count(*) FROM sem_truth) AS BIGINT) AS n_true,
       |       CAST((SELECT count(*) FROM sem_flags) AS BIGINT) AS n_flagged,
       |       CAST((SELECT count(*) FROM sem_flags f JOIN sem_truth t
       |             ON f.vec_id = t.vec_id) AS BIGINT) AS n_hit,
       |       CAST(CASE WHEN (SELECT count(*) FROM sem_truth) = 0 THEN 0
       |            ELSE (SELECT count(*) FROM sem_flags f JOIN sem_truth t
       |                  ON f.vec_id = t.vec_id) * 10000
       |                 // (SELECT count(*) FROM sem_truth) END AS BIGINT)
       |         AS recall_bp""".stripMargin

  /** FUSED decontamination — the union of the two shipped families with
    * per-source provenance, because a real pipeline flags a document if
    * EITHER test fires: `dd_contaminate`'s asymmetric n-gram overlap
    * (exact, surface-form leaks) and `dd_contaminate_sem`'s
    * embedding-space pass through the serving ANN index (paraphrased
    * leaks). Shipping them fused matters precisely because
    * `rag_hybrid_recall` proved naive fusion can LOSE recall when it
    * re-ranks; decontamination fuses by SET UNION — monotone by
    * construction — and [[ddDeconRecall]] certifies that fact against
    * exact truth instead of asking users to trust the construction.
    * One row per flagged doc: `src` says which family fired
    * (lexical/semantic/both), the per-family evidence columns are NULL
    * where that family did not fire (lexical reduced to its best eval
    * match per doc — max shared n-grams, ties to min eval id — the
    * same rule the semantic family already applies to d2).
    */
  def ddDeconFused(s: SparkSession, d: String): DataFrame =
    fuseDecon(lexBestOf(TextQueries.contaminateDerived(s, d, salt = None)),
      ddContaminateSem(s, d))

  /** Per-doc best lexical match (max shared n-grams, ties to min eval
    * id — the rule the semantic family applies to d2), factored for the
    * streaming twin.
    */
  private[graft] def lexBestOf(lexPairs: DataFrame): DataFrame =
    lexPairs.groupBy("doc_id")
      .agg(min(struct((-col("shared_ngrams")).as("ns"), col("eval_id")))
        .as("mm"))
      .select(col("doc_id"), col("mm.eval_id").as("lex_eval_id"),
        (-col("mm.ns")).as("lex_shared"))

  /** The union-with-provenance combiner — ONE code path for the batch
    * row and the streaming twin, so the fusion semantics cannot drift
    * between them: full-outer join of the two families' per-doc
    * verdicts, `src` records which fired, per-family evidence NULL
    * where it did not.
    */
  private[graft] def fuseDecon(lexBest: DataFrame, sem: DataFrame): DataFrame = {
    val semP = sem.select(col("vec_id"), col("eval_id").as("sem_eval_id"),
      col("d2").as("sem_d2"))
    lexBest.join(semP, col("doc_id") === col("vec_id"), "full_outer")
      .select(coalesce(col("doc_id"), col("vec_id")).as("doc_id"),
        when(col("doc_id").isNotNull && col("vec_id").isNotNull, "both")
          .when(col("doc_id").isNotNull, "lexical")
          .otherwise("semantic").as("src"),
        col("lex_eval_id"), col("lex_shared"),
        col("sem_eval_id"), col("sem_d2"))
      .orderBy("doc_id")
  }

  /** The lexical chain + per-doc best reduction as CTEs ending in
    * `lex_best` — shared verbatim by `dd_decon_fused` and
    * `dd_decon_recall`. CTE names are l-prefixed: the sem chain this
    * always rides with owns the bare ones.
    */
  private def lexBestSqlChain: String =
    """ltoks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                             t -> len(t) > 0) AS tk
      |  FROM documents
      |), lsh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(tk) >= 5 THEN list_transform(range(1, len(tk) - 3),
      |      i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3], tk[i+4]))
      |    ELSE [array_to_string(tk, ' ')] END)) AS g
      |  FROM ltoks
      |), lex AS (
      |  SELECT c.doc_id, e.doc_id AS eval_id,
      |         CAST(count(*) AS BIGINT) AS shared_ngrams
      |  FROM lsh c JOIN lsh e ON c.g = e.g
      |  WHERE e.doc_id % 20 = 0 AND c.doc_id % 20 <> 0
      |  GROUP BY 1, 2 HAVING count(*) >= 2
      |), lex_best AS (
      |  SELECT doc_id, eval_id AS lex_eval_id, shared_ngrams AS lex_shared
      |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
      |          ORDER BY shared_ngrams DESC, eval_id) AS lrk FROM lex)
      |  WHERE lrk = 1
      |)""".stripMargin

  val ddDeconFusedSql: String =
    s"""WITH $semSqlChain,
       |$lexBestSqlChain
       |SELECT coalesce(l.doc_id, sm.vec_id) AS doc_id,
       |       CASE WHEN l.doc_id IS NOT NULL AND sm.vec_id IS NOT NULL
       |              THEN 'both'
       |            WHEN l.doc_id IS NOT NULL THEN 'lexical'
       |            ELSE 'semantic' END AS src,
       |       l.lex_eval_id, l.lex_shared,
       |       sm.eval_id AS sem_eval_id, sm.d2 AS sem_d2
       |FROM lex_best l FULL JOIN sem_flags sm ON l.doc_id = sm.vec_id
       |ORDER BY doc_id""".stripMargin

  /** Recall of the FUSED flag set against exact union truth — the row
    * that certifies fusion-by-union cannot lose what either family had
    * (`rag_hybrid_recall`'s lesson made checkable): truth is the union
    * of the exact lexical flags (the lexical family IS exact) and the
    * brute-force semantic truth (`dd_sem_recall`'s pass), and the
    * published per-family coverages let the spec assert
    * fused >= lexical-alone and fused >= semantic-alone on the SAME
    * truth set. The fused recall's only misses are the semantic ANN
    * misses — bought down by nprobe exactly like `dd_sem_recall`.
    */
  def ddDeconRecall(s: SparkSession, d: String): DataFrame = {
    val evalN = semEvalN(s)
    val qv = pqQuantize(Tables.embeddings(s, d))
    val semTruth = qv.filter(col("vec_id") >= evalN)
      .select(col("vec_id"), col("q").as("cq"))
      .crossJoin(broadcast(qv.filter(col("vec_id") < evalN)
        .select(col("vec_id").as("eval_id"), col("q").as("qq"))))
      .filter(distL2(col("qq"), col("cq")) <= semTau(s))
      .select("vec_id").distinct()
    // NEGATIVE RESULT (optimization r14, measured): this one action
    // plans the lexical chain four times and the semantic chain three
    // times (fused's two consumers, the truth union, the per-family
    // counts) — but BOTH staging variants measured SLOWER than the
    // inline plan at sf0.1 isolated min-of-3: full chain staging 3.60 →
    // 4.74 s, staging only the fused flag set 3.60 → 4.61 s. The
    // duplicate subtrees read staged artifacts (the ivfpq index, the
    // content-collapse exchanges) and overlap on idle cores inside one
    // action, while every staging write is a serial barrier. Left
    // inline deliberately — at cluster saturation the trade flips, but
    // that is a production-profile decision, not a bench win.
    val lexTruth = TextQueries.contaminateDerived(s, d, salt = None)
      .select(col("doc_id").as("vec_id")).distinct()
    val truth = lexTruth.unionByName(semTruth).distinct()
    val fused = ddDeconFused(s, d).select(col("doc_id").as("vec_id"))
    val semFlags = ddContaminateSem(s, d).select("vec_id")
    truth.join(fused.withColumn("hit", lit(1L)), Seq("vec_id"), "left")
      .agg(count(lit(1)).cast("long").as("n_true"),
        coalesce(sum("hit"), lit(0L)).cast("long").as("n_hit"))
      .crossJoin(broadcast(
        fused.agg(count(lit(1)).cast("long").as("n_flagged"))))
      .crossJoin(broadcast(
        lexTruth.agg(count(lit(1)).cast("long").as("n_lex"))))
      .crossJoin(broadcast(
        semFlags.agg(count(lit(1)).cast("long").as("n_sem"))))
      .select(col("n_true"), col("n_flagged"), col("n_hit"),
        when(col("n_true") === 0L, lit(0L))
          .otherwise(expr("n_hit * 10000 div n_true")).cast("long")
          .as("recall_bp"),
        when(col("n_true") === 0L, lit(0L))
          .otherwise(expr("n_lex * 10000 div n_true")).cast("long")
          .as("lex_only_bp"),
        when(col("n_true") === 0L, lit(0L))
          .otherwise(expr("n_sem * 10000 div n_true")).cast("long")
          .as("sem_only_bp"))
  }

  val ddDeconRecallSql: String =
    s"""WITH $semSqlChain,
       |$lexBestSqlChain,
       |sem_truth AS (
       |  SELECT DISTINCT c.vec_id
       |  FROM (SELECT * FROM qv WHERE vec_id >= $SemEvalN) c,
       |       (SELECT * FROM qv WHERE vec_id < $SemEvalN) e
       |  WHERE list_sum(list_transform(range(1, len(e.q)+1),
       |          i -> (e.q[i] - c.q[i]) * (e.q[i] - c.q[i]))) <= $SemTau
       |),
       |lex_truth AS (SELECT DISTINCT doc_id AS vec_id FROM lex),
       |dtruth AS (SELECT vec_id FROM lex_truth
       |           UNION SELECT vec_id FROM sem_truth),
       |dfused AS (
       |  SELECT coalesce(l.doc_id, sm.vec_id) AS vec_id
       |  FROM lex_best l FULL JOIN sem_flags sm ON l.doc_id = sm.vec_id)
       |SELECT CAST((SELECT count(*) FROM dtruth) AS BIGINT) AS n_true,
       |       CAST((SELECT count(*) FROM dfused) AS BIGINT) AS n_flagged,
       |       CAST((SELECT count(*) FROM dfused f JOIN dtruth t
       |             ON f.vec_id = t.vec_id) AS BIGINT) AS n_hit,
       |       CAST(CASE WHEN (SELECT count(*) FROM dtruth) = 0 THEN 0
       |            ELSE (SELECT count(*) FROM dfused f JOIN dtruth t
       |                  ON f.vec_id = t.vec_id) * 10000
       |                 // (SELECT count(*) FROM dtruth) END AS BIGINT)
       |         AS recall_bp,
       |       CAST(CASE WHEN (SELECT count(*) FROM dtruth) = 0 THEN 0
       |            ELSE (SELECT count(*) FROM lex_truth) * 10000
       |                 // (SELECT count(*) FROM dtruth) END AS BIGINT)
       |         AS lex_only_bp,
       |       CAST(CASE WHEN (SELECT count(*) FROM dtruth) = 0 THEN 0
       |            ELSE (SELECT count(*) FROM sem_flags) * 10000
       |                 // (SELECT count(*) FROM dtruth) END AS BIGINT)
       |         AS sem_only_bp""".stripMargin

  /** RAG assembly on the IVF-PQ index — completes the retrieve matrix
    * (pipe_rag: brute force; pipe_rag_ann: flat-PQ ADC; this: cell-pruned
    * residual ADC). Identical assembly stages; at 100 TB this is the one
    * whose retrieve cost scales with probed cells, not corpus.
    */
  def pipeRagIvf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (coarse, rcent, codes) = ivfpqIndex(s, d)
    val hits = ivfpqProbe(queryBatch(s, d, PqNQ),
      coarse, rcent, codes, RagK)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
    val w = Window.partitionBy("query_id").orderBy("rank")
    hits.join(docs, hits("neighbor_id") === docs("doc_id"))
      .withColumn("cum_chars", sum("n_chars").over(w))
      .filter(col("cum_chars") <= RagBudget)
      .select(col("query_id"), col("rank"), col("doc_id"), col("adc_dist"),
        col("n_chars"), col("cum_chars"))
      .orderBy("query_id", "rank")
  }

  val pipeRagIvfSql: String =
    s"""WITH ${ivfpqSqlChain()},
       |rag_top AS (
       |  SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, adc_dist
       |  FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY adc_dist, neighbor_id) AS rank
       |    FROM ivf_adc
       |  ) WHERE rank <= $RagK
       |),
       |packed AS (
       |  SELECT p.query_id, p.rank, d.doc_id, p.adc_dist,
       |         CAST(len(d.text) AS BIGINT) AS n_chars,
       |         CAST(sum(len(d.text)) OVER (PARTITION BY p.query_id
       |               ORDER BY p.rank ROWS BETWEEN UNBOUNDED PRECEDING
       |               AND CURRENT ROW) AS BIGINT) AS cum_chars
       |  FROM rag_top p JOIN documents d ON p.neighbor_id = d.doc_id
       |)
       |SELECT * FROM packed WHERE cum_chars <= $RagBudget
       |ORDER BY query_id, rank""".stripMargin

  // ---- hybrid retrieval: lexical TF-IDF + dense PQ, RRF-fused ----
  // The retrieval shape RAG systems actually deploy: a lexical ranking
  // (integer TF-IDF over a df-capped inverted index) and a dense ranking
  // (the persisted-PQ ADC probe) fused by reciprocal-rank fusion
  // (Cormack et al. 2009) — RRF needs only RANKS, so the fusion is pure
  // integer arithmetic and oracle-exact. idf is the integer
  // floor(log2(N div df)) (length(bin(x))-1 — identical in both
  // engines); tokens in more than 1/8 of the corpus are dropped from the
  // postings (they carry ~no idf and only widen the join — the
  // dd_ngram_jaccard df-cap doctrine).
  //
  // Scale shape: one corpus tokenize+groupBy builds (doc, term, tf); the
  // lexical join is query-side-broadcast against the capped postings;
  // the dense side reads the persisted codes; fusion windows ≤2·HybK
  // rows per query. The corpus never moves twice and never cross-joins.
  private val HybK = 20    // per-system shortlist depth
  private val HybRrfK = 60 // RRF damping constant
  private val HybNQ = 10   // query docs: doc_id < 10 (the pipe_rag set)

  /** The (lex, dense, fused) candidate frames shared by `pipe_rag_hybrid`
    * and its recall eval `rag_hybrid_recall` — one builder so the eval
    * can never drift from the retrieval it evaluates (the dd_lsh_recall
    * doctrine at the DataFrame level; the SQL twin shares
    * [[hybridSqlChain]] the same way).
    */
  private[graft] def hybridFrames(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val toks = docs.select(col("doc_id"),
        explode(graft.functions.TextFns.tokens(col("text"))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).cast("long").as("tf"))
    val nDocs = docs.select(count(lit(1)).cast("long").as("n_docs"))
    val idf = toks.groupBy("t").agg(count(lit(1)).cast("long").as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") * 8 <= col("n_docs"))
      .select(col("t"),
        (length(bin(expr("n_docs div df"))) - 1).cast("long").as("idf"))
    val qt = toks.filter(col("doc_id") < HybNQ)
      .select(col("doc_id").as("query_id"), col("t"), col("tf").as("tfq"))
    val lex = toks.join(broadcast(qt.join(idf, "t")), Seq("t"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("tf") * col("tfq") * col("idf")).as("lex_score"))
      .withColumn("lex_rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(desc("lex_score"), col("doc_id"))).cast("long"))
      .filter(col("lex_rank") <= HybK)
      .select("query_id", "doc_id", "lex_rank")
    val (cent, codes) = pqIndex(s, d)
    val dense = pqProbe(pqCells(pqQuantize(
        Tables.embeddings(s, d).filter(col("vec_id") < HybNQ))),
        cent, codes, HybK)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("den_rank"))
    val cand = lex.select("query_id", "doc_id")
      .union(dense.select("query_id", "doc_id")).distinct()
    val fused = cand.join(lex, Seq("query_id", "doc_id"), "left")
      .join(dense, Seq("query_id", "doc_id"), "left")
      .select(col("query_id"), col("doc_id"),
        (coalesce(expr(s"1000000 div ($HybRrfK + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($HybRrfK + den_rank)"), lit(0L)))
          .as("rrf"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("rrf"), col("doc_id")))
        .cast("long"))
      .filter(col("rank") <= RagK)
      .select("query_id", "rank", "doc_id", "rrf")
    (lex, dense, fused)
  }

  def pipeRagHybrid(s: SparkSession, d: String): DataFrame =
    hybridFrames(s, d)._3.orderBy("query_id", "rank")

  /** Recall@RagK of each retrieval system — lexical alone, dense alone,
    * and the RRF fusion — against the exact integer-L2 top-RagK over the
    * quantized grid (the dense truth every other certified recall row
    * uses; for the lexical system this measures how much SEMANTIC
    * neighborhood pure term overlap recovers). Each system is cut to the
    * same depth (RagK) so the comparison is budget-fair. RRF dominance
    * over both single systems is NOT universal (Cormack 2009 reports
    * typical, not guaranteed, wins), so this row publishes the measured
    * decomposition instead of asserting an inequality — the spec locks
    * only what must hold (fused ∪ candidates ⊇ either system's hits at
    * equal depth is false in general, so nothing is over-claimed).
    */
  def ragHybridRecall(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (lex, dense, fused) = hybridFrames(s, d)
    val qv = pqQuantize(Tables.embeddings(s, d))
    val qq = qv.filter(col("vec_id") < HybNQ)
    val exact = qv.select(col("vec_id").as("doc_id"), col("q").as("cq"))
      .crossJoin(broadcast(qq.select(col("vec_id").as("query_id"),
        col("q").as("qq"))))
      .filter(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"),
        distL2(col("qq"), col("cq")).as("d2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d2"), col("doc_id"))))
      .filter(col("rk") <= RagK)
      .select("query_id", "doc_id")
    def hitsOf(sys: DataFrame, name: String): DataFrame =
      sys.join(exact, Seq("query_id", "doc_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as(name))
    qq.select(col("vec_id").as("query_id"))
      .join(hitsOf(lex.filter(col("lex_rank") <= RagK)
        .select("query_id", "doc_id"), "n_hits_lex"), Seq("query_id"), "left")
      .join(hitsOf(dense.filter(col("den_rank") <= RagK)
        .select("query_id", "doc_id"), "n_hits_dense"), Seq("query_id"), "left")
      .join(hitsOf(fused.select("query_id", "doc_id"), "n_hits_fused"),
        Seq("query_id"), "left")
      .na.fill(0L, Seq("n_hits_lex", "n_hits_dense", "n_hits_fused"))
      .select(col("query_id"), col("n_hits_lex"), col("n_hits_dense"),
        col("n_hits_fused"),
        (col("n_hits_fused") * lit(10000L / RagK)).cast("long")
          .as("recall_bp_fused"))
      .orderBy("query_id")
  }

  /** Everything through the fused ranking as a WITH body ending in
    * `hyb_top` (plus `lex` / `dense` / `qv` in scope) — shared verbatim
    * by `pipe_rag_hybrid` and `rag_hybrid_recall`.
    */
  private def hybridSqlChain: String =
    s"""$pqSqlChain,
       |toks AS (
       |  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM (
       |    SELECT doc_id,
       |           unnest(list_filter(
       |             string_split_regex(lower(trim(text)), '\\s+'),
       |             x -> len(x) > 0)) AS t
       |    FROM documents)
       |  GROUP BY 1, 2
       |),
       |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
       |idf AS (
       |  SELECT t, CAST(len(bin(n_docs // df)) - 1 AS BIGINT) AS idf
       |  FROM (SELECT t, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY 1),
       |       nd
       |  WHERE df * 8 <= n_docs
       |),
       |qt AS (SELECT doc_id AS query_id, t, tf AS tfq FROM toks
       |       WHERE doc_id < $HybNQ),
       |lexs AS (
       |  SELECT q.query_id, c.doc_id,
       |         CAST(sum(c.tf * q.tfq * i.idf) AS BIGINT) AS lex_score
       |  FROM qt q JOIN idf i USING (t) JOIN toks c USING (t)
       |  WHERE c.doc_id <> q.query_id
       |  GROUP BY 1, 2
       |),
       |lex AS (
       |  SELECT query_id, doc_id, CAST(rn AS BIGINT) AS lex_rank FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY lex_score DESC, doc_id) AS rn
       |    FROM lexs)
       |  WHERE rn <= $HybK
       |),
       |dense AS (
       |  SELECT query_id, neighbor_id AS doc_id, CAST(rn AS BIGINT) AS den_rank
       |  FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY adc_dist, neighbor_id) AS rn
       |    FROM adc WHERE query_id < $HybNQ)
       |  WHERE rn <= $HybK
       |),
       |cand AS (
       |  SELECT query_id, doc_id FROM lex
       |  UNION
       |  SELECT query_id, doc_id FROM dense
       |),
       |fused AS (
       |  SELECT c.query_id, c.doc_id,
       |         CAST(COALESCE(1000000 // ($HybRrfK + l.lex_rank), 0)
       |            + COALESCE(1000000 // ($HybRrfK + d.den_rank), 0)
       |              AS BIGINT) AS rrf
       |  FROM cand c
       |  LEFT JOIN lex l USING (query_id, doc_id)
       |  LEFT JOIN dense d USING (query_id, doc_id)
       |),
       |hyb_top AS (
       |  SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, rrf FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY rrf DESC, doc_id) AS rank
       |    FROM fused)
       |  WHERE rank <= $RagK
       |)""".stripMargin

  val pipeRagHybridSql: String =
    s"""WITH $hybridSqlChain
       |SELECT query_id, rank, doc_id, rrf
       |FROM hyb_top ORDER BY query_id, rank""".stripMargin

  val ragHybridRecallSql: String =
    s"""WITH $hybridSqlChain,
       |exact AS (
       |  SELECT query_id, doc_id FROM (
       |    SELECT qy.vec_id AS query_id, c.vec_id AS doc_id,
       |           row_number() OVER (PARTITION BY qy.vec_id ORDER BY
       |             list_sum(list_transform(range(1, len(qy.q)+1),
       |               i -> (qy.q[i] - c.q[i]) * (qy.q[i] - c.q[i]))),
       |             c.vec_id) AS rk
       |    FROM (SELECT * FROM qv WHERE vec_id < $HybNQ) qy, qv c
       |    WHERE c.vec_id <> qy.vec_id)
       |  WHERE rk <= $RagK
       |), hl AS (
       |  SELECT l.query_id, CAST(count(*) AS BIGINT) AS n
       |  FROM lex l JOIN exact e
       |    ON l.query_id = e.query_id AND l.doc_id = e.doc_id
       |  WHERE l.lex_rank <= $RagK GROUP BY 1
       |), hd AS (
       |  SELECT d.query_id, CAST(count(*) AS BIGINT) AS n
       |  FROM dense d JOIN exact e
       |    ON d.query_id = e.query_id AND d.doc_id = e.doc_id
       |  WHERE d.den_rank <= $RagK GROUP BY 1
       |), hf AS (
       |  SELECT f.query_id, CAST(count(*) AS BIGINT) AS n
       |  FROM hyb_top f JOIN exact e
       |    ON f.query_id = e.query_id AND f.doc_id = e.doc_id
       |  GROUP BY 1
       |)
       |SELECT q.query_id,
       |       CAST(COALESCE(hl.n, 0) AS BIGINT) AS n_hits_lex,
       |       CAST(COALESCE(hd.n, 0) AS BIGINT) AS n_hits_dense,
       |       CAST(COALESCE(hf.n, 0) AS BIGINT) AS n_hits_fused,
       |       CAST(COALESCE(hf.n, 0) * ${10000 / RagK} AS BIGINT)
       |         AS recall_bp_fused
       |FROM (SELECT vec_id AS query_id FROM qv WHERE vec_id < $HybNQ) q
       |LEFT JOIN hl USING (query_id)
       |LEFT JOIN hd USING (query_id)
       |LEFT JOIN hf USING (query_id)
       |ORDER BY query_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "sim_pq" -> (simPq _),
    "sim_pq_recall" -> (simPqRecall _),
    "sim_pq_rerank" -> (simPqRerank _),
    "sim_rerank_recall" -> (simRerankRecall _),
    "sim_ivfpq" -> (simIvfpq _),
    "sim_ivfpq_recall" -> (simIvfpqRecall _),
    "sim_ivfpq_rerank" -> (simIvfpqRerank _),
    "sim_ivfpq_rr_recall" -> (simIvfpqRrRecall _),
    "sim_ivfpq_incr" -> (simIvfpqIncr _),
    "sim_ivfpq_del" -> (simIvfpqDel _),
    "sim_ivfpq_store" -> (simIvfpqStore _),
    "sim_ivfpq_rot" -> (simIvfpqRot _),
    "dd_contaminate_sem" -> (ddContaminateSem _),
    "dd_sem_recall" -> (ddSemRecall _),
    "dd_decon_fused" -> (ddDeconFused _),
    "dd_decon_recall" -> (ddDeconRecall _),
    "pipe_rag" -> (pipeRag _),
    "pipe_rag_ann" -> (pipeRagAnn _),
    "pipe_rag_ivf" -> (pipeRagIvf _),
    "pipe_rag_hybrid" -> (pipeRagHybrid _),
    "rag_hybrid_recall" -> (ragHybridRecall _),
    "sim_recall" -> (simRecall _),
    "emb_quantize" -> (embQuantize _),
    "sim_topk_bruteforce" -> (simTopkBruteforce _),
    "sim_lsh_bucket" -> (simLshBucket _),
    "sim_ivf_topk" -> (simIvfTopk _),
    "dd_embed_cosine" -> (ddEmbedCosine _),
    "dd_semdedup" -> (ddSemdedup _),
    "emb_kmeans" -> (embKmeans _)
  )

  val oracles: Map[String, String] = Map(
    "sim_pq" -> simPqSql,
    "sim_pq_recall" -> simPqRecallSql,
    "sim_pq_rerank" -> simPqRerankSql,
    "sim_rerank_recall" -> simRerankRecallSql,
    "sim_ivfpq" -> simIvfpqSql,
    "sim_ivfpq_recall" -> simIvfpqRecallSql,
    "sim_ivfpq_rerank" -> simIvfpqRerankSql,
    "sim_ivfpq_rr_recall" -> simIvfpqRrRecallSql,
    "sim_ivfpq_incr" -> simIvfpqIncrSql,
    "sim_ivfpq_del" -> simIvfpqDelSql,
    "sim_ivfpq_store" -> simIvfpqStoreSql,
    "sim_ivfpq_rot" -> simIvfpqRotSql,
    "dd_contaminate_sem" -> ddContaminateSemSql,
    "dd_sem_recall" -> ddSemRecallSql,
    "dd_decon_fused" -> ddDeconFusedSql,
    "dd_decon_recall" -> ddDeconRecallSql,
    "pipe_rag" -> pipeRagSql,
    "pipe_rag_ann" -> pipeRagAnnSql,
    "pipe_rag_ivf" -> pipeRagIvfSql,
    "pipe_rag_hybrid" -> pipeRagHybridSql,
    "rag_hybrid_recall" -> ragHybridRecallSql,
    "sim_recall" -> simRecallSql,
    "emb_quantize" -> embQuantizeSql,
    "sim_topk_bruteforce" -> simTopkBruteforceSql,
    "sim_lsh_bucket" -> simLshBucketSql,
    "sim_ivf_topk" -> simIvfTopkSql,
    "dd_embed_cosine" -> ddEmbedCosineSql,
    "dd_semdedup" -> ddSemdedupSql,
    "emb_kmeans" -> embKmeansSql
  )
}
