package graft.operators

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSuite {

  private lazy val ev = Tables.events(spark, sf)

  test("HLL per-type estimates are within 5% of exact distinct counts") {
    val approx = Sketches.approxUsersByType(ev)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.filter(col("user_id").isNotNull)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (t, n) =>
      val a = approx(t)
      assert(math.abs(a - n) <= math.max(1L, (n * 0.05).toLong),
        s"type $t: approx $a vs exact $n")
    }
  }

  test("merged per-type sketches estimate the GLOBAL distinct (mergeability)") {
    val merged = Sketches.approxUsersGlobal(ev).collect().head.getLong(0)
    val exact = ev.filter(col("user_id").isNotNull)
      .agg(countDistinct("user_id")).collect().head.getLong(0)
    // the union must deduplicate users appearing under several types —
    // a non-merging rollup would sum to ~5x the true cardinality here
    assert(math.abs(merged - exact) <= math.max(1L, (exact * 0.05).toLong),
      s"merged $merged vs exact $exact")
  }

  test("rolling HLL active-user counts track the exact 7-day rolling distinct") {
    val approx = Sketches.approxRollingActive(ev)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val exact = graft.queries.ScaleOps.evRollingActive(spark, sf)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // same reporting days, each estimate within HLL error of the exact
    // count (lgK=12 → ~1.6% stderr; 5% is a 3σ bound)
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (d, n) =>
      val a = approx(d)
      assert(math.abs(a - n) <= math.max(1L, (n * 0.05).toLong),
        s"day $d: approx $a vs exact $n")
    }
  }

  test("count-min token sketch: never undercounts, overcount bounded by eps*N") {
    val docs = Tables.documents(spark, sf)
    val bytes = Sketches.tokenCountSketch(docs, eps = 0.001, confidence = 0.99)
      .collect().head.getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val exact = docs
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("token")).limit(50)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val total = cms.totalCount()
    assert(total >= exact.map(_._2).sum, "total covers at least the top-50 mass")
    exact.foreach { case (tok, n) =>
      val est = cms.estimateCount(tok)
      assert(est >= n, s"$tok: CMS must never undercount ($est < $n)")
      assert(est <= n + math.max(1L, (0.001 * total).toLong) * 3,
        s"$tok: overcount $est vs $n beyond 3x eps*N")
    }
  }

  test("count-min sketches merge (per-language rollup equals global estimates)") {
    val docs = Tables.documents(spark, sf)
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    val merged = langs.map { l =>
      val b = Sketches.tokenCountSketch(docs.filter(col("lang") === l),
        eps = 0.001, confidence = 0.99)
        .collect().head.getAs[Array[Byte]](0)
      org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(b))
    }.reduce { (a, b) => a.mergeInPlace(b); a }
    val globalBytes = Sketches.tokenCountSketch(docs, eps = 0.001, confidence = 0.99)
      .collect().head.getAs[Array[Byte]](0)
    val global = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(globalBytes))
    assert(merged.totalCount() == global.totalCount())
    Seq("the", "join", "filter", "data").foreach { tok =>
      assert(merged.estimateCount(tok) == global.estimateCount(tok),
        s"$tok: merged rollup must equal the one-shot global sketch")
    }
  }

  test("approx percentiles track exact percentiles") {
    val approx = Sketches.approxPricePercentiles(Tables.orders(spark, sf))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.orders(spark, sf)
      .groupBy("o_orderstatus")
      .agg(expr("percentile(o_totalprice, array(0.5, 0.9))").as("p"))
      .collect().map(r => r.getString(0) -> {
        val p = r.getSeq[Double](1); (p.head, p(1))
      }).toMap
    exact.foreach { case (st, (m, p90)) =>
      val (am, ap90) = approx(st)
      assert(math.abs(am - m) / m < 0.02, s"$st median: $am vs $m")
      assert(math.abs(ap90 - p90) / p90 < 0.02, s"$st p90: $ap90 vs $p90")
    }
  }
}
