package graft

/** Fast-fail guard against testdata schema drift (round-4 postmortem: a
  * changed parquet type for `events.ts` silently err'd 28 queries because
  * nothing analyzed every declared plan). Analysis resolves every column
  * reference against the real parquet footers without executing anything,
  * so the whole 134-query surface checks in seconds — a drift fails here
  * with the query's name and the analysis error, not as a silent hole in
  * the round's correctness artifact.
  */
class AnalyzesSpec extends SparkSuite {
  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  for (dir <- sfDirs; (name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name analyzes against $dir") {
      // touching .analyzed forces full resolution (schema + function
      // binding + type coercion) — the exact phase that broke round 4
      val plan = fn(spark, dir).queryExecution.analyzed
      assert(plan.resolved, s"$name produced an unresolved plan")
    }
  }

  test("every query has an oracle or is declared rows-only") {
    // oracleSql keys must be a subset of queries; a dangling oracle would
    // make the driver compare against a query that never ran
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracleSql entries with no query: $dangling")
  }
}
