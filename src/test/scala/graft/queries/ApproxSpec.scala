package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ApproxSpec extends SparkSuite {

  test("sk_kmv is deterministic and exact below sketch capacity") {
    val a = Approx.skKmv(spark, sf).collect().toSeq
    val b = Approx.skKmv(spark, sf).collect().toSeq
    assert(a === b)
    assert(a.size === 3)
    // per-SEGMENT sketches are exact below capacity; the 'both' row's
    // exactness guard keys on the UNION cardinality (the sketch being
    // intersected), so a small intersection of a large union is still an
    // estimate — only the error bound applies there
    a.foreach { r =>
      val (seg, exact, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      if (seg != "both" && exact < 64) assert(est === exact,
        s"segment $seg: below-capacity sketch must be exact")
      else assert(math.abs(est - exact).toDouble / exact < 0.5,
        s"segment $seg: est $est vs exact $exact — " +
          "k=64 KMV should land within ~50% even at small cardinalities")
    }
  }

  test("kmv estimate tracks exact within ~25% at sf0.01 cardinalities") {
    val rows = Approx.skKmv(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (seg, exact, est) =>
      assert(exact > 0, s"$seg empty")
      assert(math.abs(est - exact).toDouble / exact < 0.25,
        s"$seg: est $est vs exact $exact drifts > 25% (k=64 ⇒ σ≈12.5%)")
    }
  }

  test("sk_kmv_merge: merged year partials are bit-identical to the direct sketch") {
    val rows = Approx.skKmvMerge(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    // the monoid law the query exists to certify: sketching each year
    // independently and merging MUST equal one sketch over everything
    assert(rows("merged") === rows("direct"),
      "KMV union-merge must be lossless — estimate AND exact column")
    // every year row is a real partial (non-empty, estimator within the
    // k=64 error budget of its own exact count)
    val years = rows.view.filterKeys(_.startsWith("y")).toMap
    assert(years.nonEmpty)
    years.foreach { case (y, (exact, est)) =>
      assert(exact > 0, s"$y empty")
      assert(math.abs(est - exact).toDouble / exact < 0.5,
        s"$y: est $est vs exact $exact out of band")
    }
  }

  test("emb_kmeans partitions the corpus deterministically") {
    val d = "/root/testdata/sf0.01"
    val a = SimilarityQueries.embKmeans(spark, d).collect().toSeq
    val b = SimilarityQueries.embKmeans(spark, d).collect().toSeq
    assert(a === b, "integer k-means must be bit-deterministic run-over-run")
    val n = a.map(_.getLong(1)).sum
    val total = graft.Tables.embeddings(spark, d).count()
    assert(n === total, "every vector assigned to exactly one cluster")
    assert(a.map(_.getLong(0)).toSet.subsetOf((0L until 8L).toSet))
    assert(a.forall(_.getLong(3) >= 0L), "inertia is a sum of squares")
  }

  test("emb_kmeans improves on the init assignment (training does work)") {
    val d = "/root/testdata/sf0.01"
    import org.apache.spark.sql.expressions.Window
    // inertia of the INIT centroids (k lowest ids, zero iterations):
    // reproduce the operator's quantize + assign once, sum distances
    val q = graft.Tables.embeddings(spark, d)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * lit(1048576.0)).cast("long")).as("q"))
    val cent = q.orderBy("vec_id").limit(8)
      .select((row_number().over(Window.orderBy("vec_id")) - 1)
        .cast("long").as("cid"), col("q").as("cvec"))
    val initInertia = q.crossJoin(broadcast(cent))
      .withColumn("dist", aggregate(
        zip_with(col("q"), col("cvec"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x))
      .groupBy("vec_id").agg(min(col("dist")).as("d"))
      .agg(sum("d")).head().getLong(0)
    val trained = SimilarityQueries.embKmeans(spark, d)
      .agg(sum("inertia")).head().getLong(0)
    assert(trained < initInertia,
      s"3 Lloyd rounds must not increase inertia: $trained vs $initInertia")
  }
}
