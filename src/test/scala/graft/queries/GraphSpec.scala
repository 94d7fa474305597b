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

  test("triangle counts are exact on a known graph (K4 + pendant path)") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles, each node in 3) plus path 4-5-6
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("pa", "pb")
    val got = Graph.trianglesPerNode(e).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("a star hub generates no wedge work and no triangles") {
    import spark.implicits._
    // hub 0 connected to 50 leaves: degree ordering points every edge INTO
    // the hub, so the wedge join is empty — the scale property itself
    val e = (1L to 50L).map(i => (0L, i)).toDF("pa", "pb")
    assert(Graph.trianglesPerNode(e).count() === 0L)
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
