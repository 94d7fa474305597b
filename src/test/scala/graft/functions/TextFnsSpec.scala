package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextFnsSpec extends SparkSuite {
  import spark.implicits._

  test("tokens drops empties, lowercases") {
    val got = Seq("  The   Quick  fox ").toDF("t")
      .select(TextFns.tokens($"t")).as[Seq[String]].collect()(0)
    assert(got == Seq("the", "quick", "fox"))
  }

  test("shingles: n-grams with short-text fallback") {
    val df = Seq("a b c d", "a").toDF("t").select(TextFns.shingles(TextFns.tokens($"t"), 3).as("s"))
    val got = df.as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq("a"))
  }

  test("minhash: identical texts get identical signatures; signature length = k") {
    val df = Seq("spark window join table", "spark window join table", "totally different words here")
      .toDF("t")
      .select(TextFns.minhashSignature(TextFns.shingles(TextFns.tokens($"t"), 2), 8).as("sig"))
    val sigs = df.as[Seq[String]].collect()
    assert(sigs(0).length == 8)
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("quality score is within [0,1] and rewards normal prose") {
    val good = "the quick brown fox jumps over the lazy dog and runs far away to the hills"
    val bad = "x"
    val got = Seq(good, bad).toDF("t")
      .select(TextFns.qualityScore($"t", Seq("the", "a", "and", "to")).as("q"))
      .as[Double].collect()
    assert(got.forall(q => q >= 0.0 && q <= 1.0))
    assert(got(0) > got(1))
  }

  test("simhash16: stable, within 16 bits, identical for identical input") {
    val got = Seq("alpha beta gamma", "alpha beta gamma", "unrelated stuff")
      .toDF("t").select(TextFns.simhash16(TextFns.tokens($"t")).as("h")).as[Long].collect()
    assert(got(0) == got(1))
    assert(got.forall(h => h >= 0 && h < (1L << 16)))
  }

  test("fingerprint normalizes whitespace and case") {
    val got = Seq("Hello   World", "hello world").toDF("t")
      .select(TextFns.fingerprint($"t")).as[String].collect()
    assert(got(0) == got(1))
  }
}
