package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class VectorFnsSpec extends SparkSuite {
  import spark.implicits._

  test("cosine: identical=1, orthogonal=0, zero-norm=null") {
    val df = Seq(
      (Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)),
      (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),
      (Seq(0f, 0f, 0f), Seq(1f, 1f, 1f))
    ).toDF("a", "b")
    val got = df.select(VectorFns.cosine($"a", $"b").as("c")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(math.abs(got(0).get - 1.0) < 1e-12)
    assert(got(1).get == 0.0)
    assert(got(2).isEmpty)
  }

  test("dot is an exact left fold in double") {
    val got = Seq((Seq(1.5f, 2.5f), Seq(2f, 4f))).toDF("a", "b")
      .select(VectorFns.dot($"a", $"b")).as[Double].collect()(0)
    assert(got == 1.5 * 2.0 + 2.5 * 4.0)
  }

  test("signBucket maps sign pattern to bit mask") {
    val got = Seq(Seq(1f, -1f, 2f, -0.5f)).toDF("a")
      .select(VectorFns.signBucket($"a", 4)).as[Long].collect()(0)
    assert(got == (1L | 4L)) // dims 0 and 2 positive -> bits 0,2
  }
}
