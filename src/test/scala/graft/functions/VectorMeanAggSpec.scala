package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class VectorMeanAggSpec extends SparkSuite {
  import spark.implicits._

  private val centroidOf =
    new VectorMean[(Int, Array[Float])](_._2).toColumn.name("centroid")

  test("centroid aggregator: elementwise mean per group with partial aggregation") {
    val df = Seq(
      (0, Seq(1f, 2f)), (0, Seq(3f, 4f)),
      (1, Seq(10f, 20f))
    ).toDF("label", "embedding")
    val got = df.as[(Int, Array[Float])]
      .groupByKey(_._1)
      .agg(centroidOf)
      .collect().toMap
    assert(got(0).toSeq == Seq(2.0, 3.0))
    assert(got(1).toSeq == Seq(10.0, 20.0))
  }

  test("centroids over the real embeddings table: one per label, dim preserved") {
    val emb = graft.Tables.embeddings(spark, sf)
    val got = emb.select(col("label"), col("embedding")).as[(Int, Array[Float])]
      .groupByKey(_._1)
      .agg(centroidOf)
      .collect()
    assert(got.length == emb.select("label").distinct().count())
    assert(got.forall(_._2.length == 64))
  }
}
