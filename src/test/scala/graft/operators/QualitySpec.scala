package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSuite {
  import spark.implicits._

  test("completeness counts nulls and zeros per column") {
    val df = Seq(
      (Some("a"), Some(1.0)), (None, Some(0.0)), (Some("c"), None)
    ).toDF("id", "amt")
    val got = Quality.completeness(df, nullCols = Seq("id", "amt"), zeroCols = Seq("amt"))
      .collect()(0)
    assert(got.getAs[Long]("id_nulls") == 1)
    assert(got.getAs[Long]("amt_nulls") == 1)
    assert(got.getAs[Long]("amt_zeros") == 1)
  }

  test("orphans finds child keys missing from parent") {
    val child = Seq(("o1", "p1"), ("o2", "p2"), ("oX", "p3")).toDF("order_id", "pid")
    val parent = Seq("o1", "o2").toDF("order_id")
    val got = Quality.orphans(child, parent, "order_id").select("pid").as[String].collect()
    assert(got.toSeq == Seq("p3"))
  }

  test("lateness thresholds and mean") {
    val joined = Seq(1.0, 8.0, 31.0, -2.0).toDF("delta")
    val got = Quality.lateness(joined, col("delta"), Seq(7, 30)).collect()(0)
    assert(got.getAs[Long]("over_7_days") == 2)
    assert(got.getAs[Long]("over_30_days") == 1)
    assert(got.getAs[Double]("avg_delay_days") == 9.5)
  }

  test("valueCounts percentages sum to ~100 and order by count desc") {
    val got = Quality.valueCounts(Seq("a", "a", "a", "b", "c").toDF("k"), "k").collect()
    assert(got.map(_.getAs[String]("k")).toSeq == Seq("a", "b", "c"))
    assert(math.abs(got.map(_.getAs[Double]("pct")).sum - 100.0) < 0.01)
  }

  test("dateSpine calendar attributes at year boundaries") {
    val spine = Dimensions.dateSpine(spark, "2023-01-01", "2023-01-03").collect()
    assert(spine.length == 3)
    val jan1 = spine(0)
    assert(jan1.getAs[String]("day_of_week") == "Sunday")
    assert(jan1.getAs[Long]("week_number") == 52) // ISO week of 2023-01-01
    assert(jan1.getAs[Boolean]("is_weekend"))
    val jan2 = spine(1)
    assert(jan2.getAs[Long]("week_number") == 1)
    assert(!jan2.getAs[Boolean]("is_weekend"))
  }
}
