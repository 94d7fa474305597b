package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSuite {

  // 90/10 skewed corpus: the shape that kills a naive per-stratum sort
  private lazy val skewed = spark.range(0, 10000)
    .select(col("id").as("doc_id"),
      when(col("id") % 10 < 9, "en").otherwise("fr").as("lang"))

  private val key = md5(concat(lit("strat|"), col("doc_id").cast("string")))

  test("weightedBernoulli keep-rate tracks the weight; w=0 drops all, w=10000 keeps ~all") {
    val df = spark.range(0, 20000).select(col("id"))
    def kept(bp: Long): Long =
      Sampling.weightedBernoulli(df, lit(bp),
        md5(concat(lit("w|"), col("id").cast("string")))).count()
    assert(kept(0) == 0)
    // certainty weight loses only hash=='ffffffff' rows (P ≈ 2^-32)
    assert(kept(10000) >= 19999)
    val half = kept(5000)
    // binomial(20000, 0.5): ±4σ ≈ ±283
    assert(math.abs(half - 10000) < 300, s"half-weight kept $half")
    // determinism: the keep set is a function of the hash, not the run
    assert(kept(5000) == half)
  }

  test("stratifiedTopK equals the exact full-stratum rank on skewed data") {
    val got = Sampling.stratifiedTopK(skewed, "lang", key, Seq(col("doc_id")), k = 5)
      .select("doc_id", "lang", "rk").orderBy("lang", "rk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    val exact = skewed
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy(key, col("doc_id"))))
      .filter(col("rk") <= 5)
      .select("doc_id", "lang", "rk").orderBy("lang", "rk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(got == exact)
    assert(got.count(_._2 == "en") == 5 && got.count(_._2 == "fr") == 5)
  }

  test("threshold filter sits below the rank window in the physical plan") {
    val df = Sampling.stratifiedTopK(skewed, "lang", key, Seq(col("doc_id")), k = 5)
    df.collect() // execute so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
    val winAt = plan.indexOf("Window")
    val filterAt = plan.indexOf("smp_thr")
    assert(winAt >= 0 && filterAt >= 0,
      s"expected both Window and threshold filter in plan:\n$plan")
    // tree prints children below parents: the threshold comparison must
    // appear in the Window's subtree, i.e. the sort input is pre-pruned
    assert(filterAt > winAt,
      s"threshold filter must be below the Window (input pruned before sort):\n$plan")
  }

  test("small strata (below overSample*k) are kept exactly — threshold clamps to ffffffff") {
    val tiny = spark.range(0, 30)
      .select(col("id").as("doc_id"), lit("xx").as("lang"))
    val got = Sampling.stratifiedTopK(tiny, "lang", key, Seq(col("doc_id")), k = 20)
    assert(got.count() == 20) // all 30 survive the threshold, rank keeps 20
  }
}
