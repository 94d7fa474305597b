package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSuite {

  test("pagerank is deterministic run-over-run (integer iteration)") {
    val a = Graph.prCopurchase(spark, sf).collect().toSeq
    val b = Graph.prCopurchase(spark, sf).collect().toSeq
    assert(a === b)
    assert(a.size === 20)
  }

  test("pagerank scores respect the damping floor and follow degree") {
    val out = Graph.prCopurchase(spark, sf)
    // every node keeps at least the 0.15 base mass (in micros)
    assert(out.filter(col("pr") < 150000L).count() === 0L)
    // the ranking must actually discriminate
    val distinct = out.select("pr").distinct().count()
    assert(distinct > 1, "all pageranks equal — iteration did nothing")
  }
}
