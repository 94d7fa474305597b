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
      |    (sqrt(list_sum(list_transform(range(1, len(qe)+1),
      |                            i -> qe[i]::DOUBLE * qe[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, len(ce)+1),
      |                            i -> ce[i]::DOUBLE * ce[i]::DOUBLE)))) AS score
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
      |    (sqrt(list_sum(list_transform(range(1, len(qe)+1),
      |                            i -> qe[i]::DOUBLE * qe[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, len(ce)+1),
      |                            i -> ce[i]::DOUBLE * ce[i]::DOUBLE)))) AS score
      |  FROM q JOIN c USING (bucket) WHERE query_id <> neighbor_id
      |)
      |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
      |       round(score, 4) AS score
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |                               ORDER BY score DESC, neighbor_id) AS rank
      |  FROM scored
      |) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  val queries: Map[String, Q] = Map(
    "sim_topk_bruteforce" -> (simTopkBruteforce _),
    "sim_lsh_bucket" -> (simLshBucket _)
  )

  val oracles: Map[String, String] = Map(
    "sim_topk_bruteforce" -> simTopkBruteforceSql,
    "sim_lsh_bucket" -> simLshBucketSql
  )
}
