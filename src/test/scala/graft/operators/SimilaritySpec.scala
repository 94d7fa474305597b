package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private val corpus = Seq(
    (0L, Seq(1f, 0f, 0f)),
    (1L, Seq(0.9f, 0.1f, 0f)),  // closest to 0
    (2L, Seq(0f, 1f, 0f)),
    (3L, Seq(-1f, 0f, 0f))      // farthest from 0
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine, excludes self") {
    val got = Similarity.bruteForceTopK(corpus.filter($"vec_id" === 0), corpus, 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("lshTopK only pairs within the same sign bucket") {
    val got = Similarity.lshTopK(corpus.filter($"vec_id" === 0), corpus, 5, nBits = 1)
      .select("neighbor_id").as[Long].collect().toSet
    // nBits=1: bucket = sign of dim0. vec0,vec1 -> 1; vec2,vec3 -> 0
    assert(got == Set(1L))
  }

  test("topk matches oracle-checked shape: rank is 1-based and dense per query") {
    val emb = graft.Tables.embeddings(spark, sf)
    val got = Similarity.bruteForceTopK(emb.filter($"vec_id" < 3), emb, 5)
    val ranks = got.groupBy("query_id").agg(collect_list("rank").as("r"))
      .select("r").as[Seq[Long]].collect()
    assert(ranks.forall(_.sorted == Seq(1L, 2L, 3L, 4L, 5L)))
  }
}
