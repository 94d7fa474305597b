package graft.multimodal

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MediaSpec extends SparkSuite {
  implicit lazy val s: org.apache.spark.sql.SparkSession = spark
  import SparkSuite.session.implicits._

  private lazy val media = Media.fromDocuments(graft.Tables.documents(spark, sf))

  test("media table: binary column + typed metadata, one row per doc") {
    val schema = media.schema
    assert(schema("bytes").dataType.typeName == "binary")
    assert(media.count() == 500)
    assert(media.select("kind").distinct().count() == 3)
  }

  test("batched feature extraction: deterministic, no shuffle, hist sums to n_bytes") {
    val feats = Media.extractFeatures(media).cache()
    assert(feats.count() == 500)
    val bad = feats.filter(f => f.hist.sum != f.n_bytes).count()
    assert(bad == 0)
    // determinism: run twice, same result
    val a = feats.filter(col("media_id") === 0).collect()(0)
    val b = Media.extractFeatures(media).filter(col("media_id") === 0).collect()(0)
    assert(a.byte_mean == b.byte_mean && a.hist.toSeq == b.hist.toSeq)
    // no exchange in the plan: extraction is partition-local
    val plan = Media.extractFeatures(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("frame sampling explodes video rows only") {
    val frames = Media.sampleFrames(media, stride = 2)
    val videoIds = media.filter(col("kind") === "video").select("media_id")
      .collect().map(_.getLong(0)).toSet
    val perVideo = frames.filter(f => videoIds.contains(f.media_id))
      .groupByKey(_.media_id).count().collect()
    assert(perVideo.exists(_._2 > 1)) // long docs produce multiple frames
    val nonVideo = frames.filter(f => !videoIds.contains(f.media_id))
      .groupByKey(_.media_id).count().collect()
    assert(nonVideo.forall(_._2 == 1))
  }

  test("resize updates metadata") {
    val r = Media.resize(media, 224, 224).head()
    assert(r.width == 224 && r.height == 224)
  }
}
