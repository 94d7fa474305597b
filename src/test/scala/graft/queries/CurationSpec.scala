package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSuite {

  test("interleave quotas sum to exactly the mix total") {
    val out = Curation.dsInterleave(spark, sf)
    assert(out.count() === 100L)
    // largest-remainder allocation: every stratum's take is within 1 of
    // its exact proportional share
    val docs = graft.Tables.documents(spark, sf)
    val total = docs.count().toDouble
    val shares = docs.groupBy("lang", "source").count()
      .withColumn("share", col("count") * 100 / total)
    val takes = out.groupBy("lang", "source")
      .agg(count(lit(1)).as("take"))
    val joined = shares.join(takes, Seq("lang", "source"), "left")
      .select(col("share"),
        coalesce(col("take"), lit(0L)).cast("double").as("take"))
      .collect()
    joined.foreach { r =>
      val (share, take) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(take - share) < 1.0 + 1e-9,
        s"stratum take $take vs proportional share $share")
    }
  }

  test("interleave is deterministic run-over-run") {
    val a = Curation.dsInterleave(spark, sf).collect().toSeq
    val b = Curation.dsInterleave(spark, sf).collect().toSeq
    assert(a === b)
  }

  test("quality gate pass column is the conjunction of its rules") {
    val out = Curation.txtQualityGate(spark, sf)
    val bad = out.filter(col("pass") =!= (col("r_wordcount") &&
      col("r_mean_wlen") && col("r_unique") && col("r_stopwords") &&
      col("r_short"))).count()
    assert(bad === 0L)
    // the gate must actually discriminate on this corpus (a gate that
    // passes or fails everything proves nothing)
    val n = out.count()
    val p = out.filter(col("pass")).count()
    assert(p > 0L && p < n, s"gate passed $p of $n docs")
  }

  test("MAD outlier stats are robust to a massive injected outlier") {
    import spark.implicits._
    val base = (1 to 101).map(i => ("P", i * 100L))
    val cents = base.toDF("o_orderpriority", "cents")
    def madOf(df: org.apache.spark.sql.DataFrame): Double = {
      val med = df.groupBy("o_orderpriority")
        .agg(expr("percentile(cents, 0.5)").as("med"))
      df.join(med, "o_orderpriority")
        .select(abs(col("cents") - col("med")).as("dev"))
        .agg(expr("percentile(dev, 0.5)")).as[Double].head()
    }
    val clean = madOf(cents)
    val poisoned = madOf(cents.union(
      Seq(("P", 1000000000L)).toDF("o_orderpriority", "cents")))
    // one 10^7x outlier moves the MAD by at most one half-step of the
    // grid — the robustness a stddev fence lacks
    assert(math.abs(poisoned - clean) <= 100.0,
      s"MAD moved $clean -> $poisoned under a single outlier")
  }

  test("ds_mixture: water-filling caps bind, surplus re-levels, sum is exact") {
    val m = Curation.dsMixture(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3) == 1L))
    val totalAvail = m.map(_._2).sum
    val budget = totalAvail * 4 / 5
    // the allocation spends the budget to the token
    assert(m.map(_._3).sum == budget, s"sum(alloc) != budget in ${m.toSeq}")
    // a saturated domain contributes exactly what it has; an unsaturated
    // one never exceeds it
    assert(m.forall { case (_, av, al, sat) => if (sat) al == av else al < av })
    // the cap path and the re-level path are BOTH exercised at this SF —
    // the query's reason to exist over ds_temperature
    assert(m.exists(_._4) && m.exists(!_._4), s"degenerate profile: ${m.toSeq}")
    // water level: every unsaturated allocation is >= every saturated
    // avail (else the saturated domain wasn't actually below the level),
    // and unsaturated allocations differ by at most 1 (largest remainder)
    val unsat = m.filter(!_._4).map(_._3)
    val sat = m.filter(_._4).map(_._2)
    assert(sat.forall(a => unsat.forall(_ >= a)))
    assert(unsat.max - unsat.min <= 1)
  }

  test("pipe_shards manifest conserves the gated dedup corpus exactly") {
    val m = Curation.pipeShards(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // independently recompute the gate-surviving distinct-text corpus
    val docs = graft.Tables.documents(spark, sf)
    val survivors = graft.operators.Content.repsById(docs, Seq("text"))
      .filter(Curation.gatePass(graft.functions.TextFns.tokens(col("text"))))
      .agg(count(lit(1)).as("n"),
        sum(length(col("text")).cast("long")).as("chars")).head()
    assert(m.map(_._3).sum == survivors.getLong(0), "doc conservation")
    assert(m.map(_._4).sum == survivors.getLong(1), "char conservation")
    // bins are contiguous 0..max within each shard (running-total
    // truncation can't skip a bin: a doc landing past bin b's start
    // means some doc STARTED inside bin b)
    m.groupBy(_._1).foreach { case (shard, rows) =>
      val bins = rows.map(_._2).sorted
      assert(bins.head == 0 && bins.last == bins.length - 1,
        s"shard $shard bins not contiguous: ${bins.mkString(",")}")
    }
  }
}
