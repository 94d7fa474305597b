package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Structural contracts of the IVF-PQ index and probe; value-level
  * certification is the DuckDB oracle (`sim_ivfpq`, `sim_ivfpq_recall`).
  */
class IvfpqSpec extends SparkSuite {

  test("index: every vector has one cell and exactly PqM in-range codes") {
    val (coarse, rcent, codes) = SimilarityQueries.ivfpqIndex(spark, sf)
    val n = graft.Tables.embeddings(spark, sf).count()
    val perVec = codes.groupBy("vec_id")
      .agg(count(lit(1)).as("nc"), count_distinct(col("cid")).as("ncell"),
        count_distinct(col("m")).as("nm"))
    assert(perVec.filter(col("nc") =!= 8 || col("ncell") =!= 1 ||
      col("nm") =!= 8).count() == 0,
      "each vector: 8 subspace codes, all in one cell")
    assert(perVec.count() == n, "every corpus vector is encoded")
    assert(codes.filter(col("code") < 0 || col("code") >= 16).count() == 0)
    assert(coarse.count() <= 8 && rcent.count() <= 8 * 16)
    // centroid vectors keep full dimensionality
    assert(coarse.filter(size(col("cvec")) =!= 64).count() == 0)
    assert(rcent.filter(size(col("cvec")) =!= 8).count() == 0)
  }

  test("probe: neighbors come only from the query's probed cells") {
    import org.apache.spark.sql.expressions.Window
    val (coarse, _, codes) = SimilarityQueries.ivfpqIndex(spark, sf)
    val qq = graft.Tables.embeddings(spark, sf).filter(col("vec_id") < 50)
    val probes = SimilarityQueries.pqQuantize(qq).crossJoin(broadcast(coarse))
      .withColumn("cd",
        aggregate(zip_with(col("q"), col("cvec"),
          (x, y) => (x - y) * (x - y)), lit(0L), (a, v) => a + v))
      .withColumn("pr", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cd"), col("cid"))))
      .filter(col("pr") <= 2)
      .select(col("vec_id").as("query_id"), col("cid"))
    val r = SimilarityQueries.simIvfpq(spark, sf)
      .join(codes.select(col("vec_id").as("neighbor_id"), col("cid"))
        .distinct(), "neighbor_id")
    assert(r.join(probes, Seq("query_id", "cid"), "left_anti").count() == 0,
      "a neighbor outside the probed cells means the inverted-list prune leaked")
    assert(r.count() > 0)
  }

  test("rerank recall dominates raw IVF-PQ ADC recall per query (provable: " +
    "ADC top-5 is inside the top-50 shortlist, and at most 4 shortlist " +
    "members can exactly beat a true global-top-5 member)") {
    val adc = SimilarityQueries.simIvfpqRecall(spark, sf)
      .select(col("query_id"), col("n_hits").as("adc_hits"))
    val rr = SimilarityQueries.simIvfpqRrRecall(spark, sf)
      .select(col("query_id"), col("n_hits").as("rr_hits"))
    val joined = adc.join(rr, "query_id").cache()
    try {
      assert(joined.filter(col("rr_hits") < col("adc_hits")).count() == 0)
      val Seq(a, b) = joined.agg(sum("adc_hits"), sum("rr_hits"))
        .collect()(0).toSeq.map(_.asInstanceOf[Long])
      info(s"total hits/250: IVFPQ-ADC=$a IVFPQ-rerank=$b")
    } finally { joined.unpersist(); () }
  }

  test("probe results: dense ranks from 1, adc nondecreasing, no self") {
    val r = SimilarityQueries.simIvfpq(spark, sf).cache()
    try {
      val perQuery = r.groupBy("query_id")
        .agg(count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
      assert(perQuery.filter(col("lo") =!= 1 || col("hi") =!= col("n") ||
        col("n") > 5).count() == 0)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy("rank")
      assert(r.withColumn("prev", lag("adc_dist", 1).over(w))
        .filter(col("prev").isNotNull && col("adc_dist") < col("prev"))
        .count() == 0)
      assert(r.filter(col("query_id") === col("neighbor_id")).count() == 0)
    } finally { r.unpersist(); () }
  }
}
