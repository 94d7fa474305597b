package graft.plans

import graft.SparkSuite
import graft.functions.VectorFns
import org.apache.spark.sql.functions._

class DotProductFSpec extends SparkSuite {
  import spark.implicits._

  test("native dot is bit-identical to the higher-order-function fold on real embeddings") {
    val emb = graft.Tables.embeddings(spark, sf).limit(200)
    val a = emb.select(col("vec_id"), col("embedding").as("a"))
    val b = emb.select((col("vec_id") + 7).as("vec_id"), col("embedding").as("b"))
    val joined = a.join(b, "vec_id")
    val diffs = joined.select(
        VectorFns.dot(col("a"), col("b")).as("native"),
        VectorFns.dotHof(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof")) // bitwise equality for doubles
      .count()
    assert(diffs == 0)
  }

  test("native dot handles empty and mismatched-length arrays") {
    val got = Seq(
      (Seq.empty[Float], Seq.empty[Float]),
      (Seq(1f, 2f, 3f), Seq(2f))
    ).toDF("a", "b").select(VectorFns.dot($"a", $"b")).as[Double].collect()
    assert(got(0) == 0.0)
    assert(got(1) == 2.0) // shorter length wins
  }

  test("dot_l fails loudly on length mismatch (dimension drift must not " +
    "silently corrupt rankings)") {
    // the float dot keeps shorter-length-wins (cosine over ragged inputs
    // is a legitimate use); the integer sibling serves fixed-width
    // quantized vectors and centroids, where mismatch means upstream drift
    val e = intercept[Exception] {
      Seq((Seq(1L, 2L, 3L), Seq(2L)))
        .toDF("a", "b").select(DotProductL.dotL($"a", $"b")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c => Option(c.getMessage)
      .exists(_.contains("dot_l: array length mismatch"))), e.toString)
  }

  test("dot_l (integer sibling) equals the HOF fold and the squared-L2 expansion") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { i =>
      (i.toLong,
        Seq.fill(64)((rnd.nextInt(1 << 21) - (1 << 20)).toLong),
        Seq.fill(64)((rnd.nextInt(1 << 21) - (1 << 20)).toLong))
    }
    val df = rows.toDF("id", "a", "b")
    val bad = df.select(
        DotProductL.dotL($"a", $"b").as("native"),
        aggregate(zip_with($"a", $"b", (x, y) => x * y),
          lit(0L), (acc, x) => acc + x).as("hof"),
        // the emb_kmeans identity: Σ(a-b)² == aa - 2ab + bb in exact longs
        aggregate(zip_with($"a", $"b", (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, x) => acc + x).as("l2direct"),
        (DotProductL.dotL($"a", $"a") - lit(2L) * DotProductL.dotL($"a", $"b")
          + DotProductL.dotL($"b", $"b")).as("l2expanded"))
      .filter($"native" =!= $"hof" || $"l2direct" =!= $"l2expanded")
      .count()
    assert(bad === 0L)
  }

  test("dot_f is SQL-callable via GraftExtensions-style registration") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f", exprs => DotProductF(exprs(0), exprs(1)), "scala_udf")
    val got = spark.sql(
      "SELECT dot_f(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))").collect()(0).getDouble(0)
    assert(got == 11.0)
  }

  test("codegen path: plan contains WholeStageCodegen over the dot projection") {
    val emb = graft.Tables.embeddings(spark, sf)
    val df = emb.select(VectorFns.dot(col("embedding"), col("embedding")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" operator prefix marks whole-stage-codegen stages
    assert(plan.contains("*(1) Project") && plan.contains("dot_f"))
    assert(df.count() == 500)
  }
}
