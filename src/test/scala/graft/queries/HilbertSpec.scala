package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

class HilbertSpec extends SparkSuite {

  private lazy val grid = {
    import spark.implicits._
    val xs = (0L until 256L)
    ScaleOps.hilbertStaged(
      xs.flatMap(x => xs.map(y => (x, y))).toDF("x", "y"))
  }

  test("hilbert index is a bijection onto [0, 65536)") {
    val agg = grid.agg(count_distinct(col("h")).as("d"),
      min("h").as("lo"), max("h").as("hi")).head()
    assert(agg.getLong(0) === 65536L)
    assert(agg.getLong(1) === 0L && agg.getLong(2) === 65535L)
  }

  test("consecutive hilbert indexes are grid neighbors (unit-step continuity)") {
    // THE property that separates Hilbert from Morton: h and h+1 always
    // differ by exactly one step in Manhattan distance — no diagonal
    // jumps at bit boundaries, which is why contiguous key ranges map to
    // tight bounding boxes
    val a = grid.select(col("h"), col("x0").as("xa"), col("y0").as("ya"))
    val b = grid.select((col("h") - 1).as("h"),
      col("x0").as("xb"), col("y0").as("yb"))
    val bad = a.join(b, "h")
      .filter(abs(col("xa") - col("xb")) + abs(col("ya") - col("yb")) =!= 1)
      .count()
    assert(bad === 0L, "a Hilbert step jumped more than one cell")
  }

  test("aligned 1024-cell buckets are exact 32x32 subquadrants") {
    val spans = ScaleOps.hilbertStaged(
      grid.select(col("x0").as("x"), col("y0").as("y")))
      .groupBy(shiftright(col("h"), 10))
      .agg((max("x0") - min("x0")).as("xs"), (max("y0") - min("y0")).as("ys"))
    assert(spans.filter(col("xs") =!= 31 || col("ys") =!= 31).count() === 0L)
    assert(spans.count() === 64L)
  }
}
