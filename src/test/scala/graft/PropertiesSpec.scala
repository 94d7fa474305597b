package graft

import graft.normalize.Drift
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5): dedup idempotence, coalesce
  * totality, daily-aggregate arithmetic. Raw ScalaCheck generators sampled
  * over fixed seeds (no scalatest bridge in the offline cache).
  */
class PropertiesSpec extends SparkSuite {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val keyGen = Gen.chooseNum(0L, 20L)
  private val rowsGen = Gen.listOfN(60,
    Gen.zip(keyGen, Gen.chooseNum(0L, 1000000L), Gen.chooseNum(0.0, 500.0)))

  test("property: latestWins is idempotent and keeps exactly one row per key") {
    for (rows <- samples(rowsGen, 5) if rows.nonEmpty) {
      val df = rows.toDF("k", "ord", "v")
      val once = Dedup.latestWins(df, Seq("k"), Seq($"ord".desc, $"v".desc))
      val twice = Dedup.latestWins(once, Seq("k"), Seq($"ord".desc, $"v".desc))
      val keys = rows.map(_._1).distinct.size.toLong
      assert(once.count() == keys)
      assert(twice.collect().toSet == once.collect().toSet)
    }
  }

  test("property: status normalization is total and lands in the closed bucket set") {
    val statusGen = Gen.oneOf(
      Gen.oneOf("failed", "FAIL", "Error", "success", "PAID", "Completed", "pending"),
      Gen.alphaNumStr.map(_.take(12)))
    for (statuses <- samples(Gen.listOfN(30, statusGen), 5) if statuses.nonEmpty) {
      val got = statuses.toDF("s").select(Drift.normalizeStatus($"s")).as[String].collect()
      assert(got.length == statuses.length)
      got.zip(statuses).foreach { case (norm, raw) =>
        val lc = raw.trim.toLowerCase
        if (Seq("failed", "fail", "error").contains(lc)) assert(norm == "failed")
        else if (Seq("success", "successful", "completed", "paid").contains(lc)) assert(norm == "success")
        else assert(norm == lc)
      }
    }
  }

  test("property: coalesce-chain totality — result is first non-null or null") {
    val optGen = Gen.option(Gen.alphaNumStr.map(_.take(6)))
    for (rows <- samples(Gen.listOfN(25, Gen.zip(optGen, optGen, optGen)), 5)
         if rows.nonEmpty) {
      val got = rows.toDF("a", "b", "c")
        .select(coalesce($"a", $"b", $"c")).as[Option[String]].collect()
      got.zip(rows).foreach { case (g, (a, b, c)) =>
        assert(g == a.orElse(b).orElse(c))
      }
    }
  }

  test("property: daily aggregate net = gross - refunds and counts are consistent") {
    val ordersGen = Gen.listOfN(20, Gen.zip(
      Gen.chooseNum(1, 5).map(d => java.sql.Date.valueOf(f"2024-01-$d%02d")),
      Gen.oneOf("v_a", "v_b")))
    for (os <- samples(ordersGen, 5) if os.nonEmpty) {
      val orders = os.zipWithIndex
        .map { case ((dt, v), i) => (s"o$i", dt, v) }.toDF("order_id", "odate", "vendor")
      val payments = os.indices.map(i => (s"o$i", (i % 7) * 10.0,
        if (i % 3 == 0) "success" else "failed")).toDF("order_id", "amount", "status")
      val refunds = os.indices.filter(_ % 4 == 0)
        .map(i => (s"o$i", 5.0)).toDF("order_id", "amount")
      val daily = graft.operators.DailyRevenue.dailyAggregate(
        orders, "order_id", $"odate", $"vendor",
        payments, "order_id", $"amount", $"status",
        refunds, "order_id", $"amount").collect()
      daily.foreach { r =>
        assert(r.getAs[Double]("net_revenue") ==
          r.getAs[Double]("gross_revenue") - r.getAs[Double]("total_refunds"))
        assert(r.getAs[Long]("order_count") > 0)
      }
      assert(daily.map(_.getAs[Long]("order_count")).sum == os.size)
    }
  }

  test("property: least-chain winnow equals the slice+array_min reference") {
    import graft.functions.TextFns
    // the round-4 rewrite replaced the per-position slice+array_min with
    // a least() chain — lock equivalence on random hash arrays
    val hashGen = Gen.listOfN(12, Gen.hexStr.map(_.take(8).padTo(8, '0')))
    for ((hs, i) <- samples(hashGen, 8).zipWithIndex if hs.nonEmpty) {
      val df = Seq((i.toLong, hs)).toDF("id", "h")
      def ref(w: Int) = {
        val wins = when(size($"h") >= w,
          transform(sequence(lit(1), size($"h") - (w - 1)),
            j => array_min(slice($"h", j, lit(w)))))
          .otherwise(array(array_min($"h")))
        array_distinct(wins)
      }
      for (w <- Seq(2, 4, 7, 15)) {
        val got = df.select(TextFns.winnowFromHashes($"h", w)).collect()
        val want = df.select(ref(w)).collect()
        assert(got.map(_.getSeq[String](0)).toSeq ==
          want.map(_.getSeq[String](0)).toSeq, s"w=$w hs=$hs")
      }
    }
  }

  test("property: token-hash shingles share a hash iff the token windows match") {
    // the staged token-hash shingle scheme must preserve string-shingle
    // equality semantics: same n-token window ⇒ same hash, different
    // windows ⇒ different hashes (on the sampled universe)
    val tokGen = Gen.listOfN(8, Gen.oneOf("alpha", "beta", "gamma", "delta", "x"))
    val docs = samples(tokGen, 12).distinct
    val n = 3
    val df = docs.zipWithIndex.map { case (tk, i) => (i.toLong, tk.mkString(" ")) }
      .toDF("doc_id", "text")
      .select($"doc_id", graft.functions.TextFns.tokens($"text").as("tk"))
      .select($"doc_id", transform($"tk", t => xxhash64(t)).as("th"), $"tk")
      .select($"doc_id",
        when(size($"th") >= n,
          transform(sequence(lit(1), size($"th") - (n - 1)),
            j => xxhash64((0 until n).map(k => element_at($"th", (j + k).cast("int"))): _*)))
          .otherwise(array(xxhash64(concat_ws(" ", $"tk")))).as("hashes"),
        when(size($"tk") >= n,
          transform(sequence(lit(1), size($"tk") - (n - 1)),
            j => concat_ws(" ", (0 until n).map(k => element_at($"tk", (j + k).cast("int"))): _*)))
          .otherwise(array(concat_ws(" ", $"tk"))).as("strings"))
      .collect()
    // build the global hash→string map; any clash is a semantics break
    val seen = scala.collection.mutable.Map[Long, String]()
    df.foreach { r =>
      r.getSeq[Long](1).zip(r.getSeq[String](2)).foreach { case (h, s) =>
        seen.get(h).foreach(prev => assert(prev == s, s"hash clash: $prev vs $s"))
        seen(h) = s
      }
    }
    assert(seen.values.toSet.size == seen.size) // injective on the sample
  }
}
