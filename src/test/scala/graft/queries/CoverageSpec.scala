package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CoverageSpec extends SparkSuite {

  test("tok_coverage: totals conserve the token stream and oov_bp floors exactly") {
    val d = "/root/testdata/sf0.01"
    val out = Curation.tokCoverage(spark, d).collect()
    assert(out.nonEmpty)
    val total = graft.Tables.documents(spark, d)
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("t"))
      .count()
    assert(out.map(_.getLong(1)).sum === total,
      "per-lang totals must sum to the corpus token count")
    out.foreach { r =>
      val (tot, oov, bp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(oov <= tot)
      assert(bp === oov * 10000L / tot, "bp must be the exact integer floor")
    }
    // a 1000-token vocab over a synthetic corpus must cover SOMETHING and
    // miss something — both degenerate outcomes would make the audit vacuous
    assert(out.map(_.getLong(2)).sum > 0L, "some tokens must be OOV")
    assert(out.map(_.getLong(2)).sum < total, "some tokens must be covered")
  }

  test("dd_lsh_recall: found is a subset of truth and exact-dup recall is total") {
    val d = "/root/testdata/sf0.01"
    val out = TextQueries.ddLshRecall(spark, d).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nt, nf, bp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nf <= nt, "LSH can only recover pairs the truth set contains")
      assert(bp === nf * 10000L / nt)
    }
    // exact duplicates share every minhash — banding can never miss them,
    // so IF the 1.0 band exists its recall must be total
    out.filter(_.getString(0) == "c_exact_1.0")
      .foreach(r => assert(r.getLong(3) === 10000L))
  }

  test("ev_path_topk: paths are ≤3 stages of real event types, cut is total-ordered") {
    val d = "/root/testdata/sf0.01"
    val out = Linkage.evMarkov(spark, d).collect() // warm types
    val types = out.map(_.getString(0)).toSet ++ out.map(_.getString(1)).toSet
    val paths = Extended.evPathTopk(spark, d).collect()
    assert(paths.size === 20)
    paths.foreach { r =>
      val stages = r.getString(0).split(">")
      assert(stages.length >= 1 && stages.length <= 3)
      stages.foreach(t => assert(types.contains(t), s"unknown event type $t"))
      assert(r.getLong(1) >= 1L)
    }
    // ordering: n desc, path asc — and deterministic run-over-run
    val key = paths.map(r => (-r.getLong(1), r.getString(0))).toSeq
    assert(key === key.sorted, "top-20 must be ordered by (count desc, path)")
    assert(paths.toSeq === Extended.evPathTopk(spark, d).collect().toSeq)
  }
}
