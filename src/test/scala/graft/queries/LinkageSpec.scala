package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSuite {

  test("spark levenshtein is standard unit-cost edit distance (oracle parity pin)") {
    // DuckDB's levenshtein returns the same classic distances; these pins
    // document the parity assumption er_name_match's oracle rests on.
    val fixtures = Seq(
      ("kitten", "sitting", 3),
      ("cold widget", "blue widget", 4),
      ("cold widget", "small widget", 4),
      ("flaky", "flaky", 0),
      ("", "abc", 3))
    import spark.implicits._
    val got = fixtures.toDF("a", "b", "want")
      .select(levenshtein(col("a"), col("b")).as("lev"), col("want"))
      .collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("er_name_match: blocked join is exact for the declared match definition") {
    val d = "/root/testdata/sf0.01"
    val out = Linkage.erNameMatch(spark, d).collect()
    assert(out.nonEmpty, "sf0.01 part names share nouns; matches must exist")
    // pair canonicalization + threshold hold on every row
    out.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getLong(2) >= 1L && r.getLong(2) <= 4L)
      assert(r.getLong(3) >= 1L && r.getLong(4) >= 1L)
    }
    // completeness: brute-force the definition over the name vocabulary
    // (same last token AND lev ≤ 4) — the blocked join must find exactly it
    val names = graft.Tables.part(spark, d)
      .groupBy("p_name").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    val want = (for {
      (na, _) <- names; (nb, _) <- names
      if na < nb
      if na.split(' ').last == nb.split(' ').last
      if lev(na, nb) <= 4
    } yield (na, nb)).toSet
    val gotPairs = out.map(r => (r.getString(0), r.getString(1))).toSet
    assert(gotPairs === want, "blocked match must equal the brute-force definition")
  }

  test("er_cluster: entities are the transitive closure of the match pairs") {
    val d = "/root/testdata/sf0.01"
    val ents = Linkage.erCluster(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val pairs = Linkage.erNameMatch(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(pairs.nonEmpty && ents.nonEmpty)
    // exactly the matched names are clustered, and every match edge is
    // intra-entity (the closure can only merge, never split)
    assert(ents.keySet === (pairs.map(_._1) ++ pairs.map(_._2)).toSet)
    pairs.foreach { case (na, nb) =>
      assert(ents(na) === ents(nb), s"$na and $nb match but landed apart")
    }
    // labels are canonical: each entity's id is the min name_id among its
    // members (name_id = min p_partkey of the name)
    val nameId = graft.Tables.part(spark, d)
      .groupBy("p_name").agg(min("p_partkey").as("id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    ents.groupBy(_._2).foreach { case (eid, members) =>
      assert(members.size >= 2, "singleton names are not entities")
      assert(eid === members.keys.map(nameId).min)
    }
  }

  test("ev_markov: transitions conserve the per-user timeline") {
    val d = "/root/testdata/sf0.01"
    val out = Linkage.evMarkov(spark, d).collect()
    assert(out.nonEmpty)
    val ev = graft.Tables.events(spark, d)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
    // sum of transition counts = sum over users of (events - 1)
    val perUser = ev.groupBy("user_id").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") - lit(1L))).collect()(0).getLong(0)
    assert(out.map(_.getLong(2)).sum === perUser)
    // ppm is an exact floor: per-from ppm sums land in (1e6 - k, 1e6]
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val s = rows.map(_.getLong(3)).sum
      assert(s <= 1000000L && s > 1000000L - rows.size,
        s"floored shares must sum to within <1 ppm per to-type of 1e6, got $s")
    }
  }

  test("qr_drift: halves partition the corpus and shares are exact ppm floors") {
    val d = "/root/testdata/sf0.01"
    val out = Linkage.qrDrift(spark, d).collect()
    assert(out.nonEmpty)
    val total = graft.Tables.events(spark, d).filter(col("ts").isNotNull).count()
    assert(out.map(r => r.getLong(1) + r.getLong(2)).sum === total)
    assert(out.map(_.getLong(2)).sum >= 1L, "max-ts event is always in half B")
    out.foreach { r =>
      val (sa, sb, d2) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(sa >= 0L && sa <= 1000000L && sb >= 0L && sb <= 1000000L)
      assert(d2 === (sa - sb) * (sa - sb))
    }
    // deterministic run-over-run (integer algebra end to end)
    assert(out.toSeq === Linkage.qrDrift(spark, d).collect().toSeq)
  }
}
