package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `ds_pack`/`ds_pack_tokens` run their per-language running totals
  * through the two-level chunked prefix sum (`TextQueries.packCumsum`):
  * a flat `partitionBy(lang) rows unbounded preceding` window is correct
  * at any test SF but makes the biggest language ONE window partition —
  * one task sorting and sequentially scanning ~half the corpus at
  * 100 TB. These specs pin (a) bit-identity of the chunked form against
  * the naive flat window, (b) that the carry path is actually exercised
  * at test scale, and (c) the plan fact that no lang-only corpus-width
  * window remains in either query.
  */
class PackScaleSpec extends SparkSuite {

  test("packCumsum is bit-identical to the flat per-lang running total") {
    val base = graft.Tables.documents(spark, sf)
      .select("doc_id", "lang", "n_chars")
    val flat = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = base.withColumn("cum", sum("n_chars").over(flat))
    val chunked = TextQueries.packCumsum(base, "n_chars")
    assert(naive.select("doc_id", "cum")
      .except(chunked.select("doc_id", "cum")).count() == 0)
    assert(chunked.select("doc_id", "cum")
      .except(naive.select("doc_id", "cum")).count() == 0)
  }

  test("the carry-in path is exercised at test scale (multiple chunks, " +
    "nonzero carries)") {
    val base = graft.Tables.documents(spark, sf)
      .select("doc_id", "lang", "n_chars")
    val nChunks = base
      .select((col("doc_id") / TextQueries.PackChunkW).cast("long").as("c"))
      .distinct().count()
    assert(nChunks > 1, s"expected >1 chunk at 500 docs / 256, got $nChunks")
    // rows in chunk >= 1 must see a nonzero carry: their cum exceeds any
    // single chunk's local total only if carry-in was added
    val flat = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = base.withColumn("cum", sum("n_chars").over(flat))
      .filter(col("doc_id") >= TextQueries.PackChunkW)
    assert(naive.count() > 0)
  }

  test("no lang-only corpus-width window remains in ds_pack / " +
    "ds_pack_tokens / pipe_curate plans (the scale-killer shape)") {
    for (q <- Seq("ds_pack", "ds_pack_tokens", "pipe_curate")) {
      val df = graft.SparkEntry.queries(q)(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      // the running-total window must partition by (lang, chunk), never
      // by lang alone with doc_id as the first order key
      assert(!"windowspecdefinition\\(lang#\\d+, doc_id#".r
        .findFirstIn(p).isDefined,
        s"$q still has a per-lang corpus-width window:\n$p")
      assert("windowspecdefinition\\(lang#\\d+, chunk#\\d+".r
        .findFirstIn(p).isDefined,
        s"$q lost the chunked window shape:\n$p")
      // the carry tree must stay bounded at EVERY level: a lang-only
      // window ordering raw chunk would put corpus/256 rows in one task
      // (the r9 residual) — only the 256³-reduced chunk3 level may span
      // a whole language
      assert(!"windowspecdefinition\\(lang#\\d+, chunk#\\d+L? ASC".r
        .findFirstIn(p).isDefined,
        s"$q has an unbounded lang-only carry window over raw chunks:\n$p")
      assert("windowspecdefinition\\(lang#\\d+, chunk2#\\d+".r
        .findFirstIn(p).isDefined &&
        "windowspecdefinition\\(lang#\\d+, chunk3#\\d+L? ASC".r
          .findFirstIn(p).isDefined,
        s"$q lost the depth-3 carry tree:\n$p")
      // and no FORCED corpus-width broadcast: the pure packing path
      // (ds_pack = documents → packCumsum → groupBy) carries no broadcast
      // hint at all (the planner still auto-broadcasts the tiny carry
      // tables at test scale — that's its call, sized from real stats,
      // not a hint that would ship corpus/256 rows at 100 TB).
      // ds_pack_tokens / pipe_curate legitimately hint elsewhere
      // (k-row vocab / quota frames), so the hint lock binds where the
      // only possible hint would be the carry one.
      if (q == "ds_pack") {
        val analyzed = df.queryExecution.analyzed.toString
        assert(!analyzed.contains("ResolvedHint"),
          s"$q forces a broadcast hint in the packing path:\n$analyzed")
      }
    }
  }

  test("packCumsum keeps null-lang rows as their own partition " +
    "(bit-identity on a corpus that actually contains nulls)") {
    // the generated corpus has no null lang, so the oracle can't catch a
    // null-dropping join — this synthetic frame can: plain equality in
    // the carry joins would silently drop every null-lang row, while the
    // flat window (and DuckDB's) treats null as one more partition
    import spark.implicits._
    val rows = (0L until 600L).map { i =>
      val lang = i % 7 match {
        case 0 => null
        case k => s"l$k"
      }
      (i, lang, (i % 37) + 1)
    }
    val base = rows.toDF("doc_id", "lang", "n_chars")
    val flat = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = base.withColumn("cum", sum("n_chars").over(flat))
      .select("doc_id", "cum")
    val chunked = TextQueries.packCumsum(base, "n_chars")
      .select("doc_id", "cum")
    assert(chunked.count() == 600,
      "null-lang rows must survive the carry joins")
    assert(naive.except(chunked).count() == 0
      && chunked.except(naive).count() == 0,
      "chunked cumsum must be bit-identical to the flat window on " +
        "null-lang partitions too")
  }

  test("ds_pack bins: first bin of every language starts at 0 and bins " +
    "are monotone (packing semantics survive the rewrite)") {
    val r = TextQueries.dsPack(spark, sf).collect()
    for ((_, grp) <- r.groupBy(_.getString(0))) {
      val bins = grp.map(_.getLong(1)).sorted.toSeq
      assert(bins.head == 0L, "every language packs from bin 0")
      assert(bins.distinct == bins)
    }
  }
}
