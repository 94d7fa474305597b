package graft.multimodal

import graft.SparkSuite

/** The video codec-detection gate must behave in BOTH environments:
  * without a codec on the classpath it falls back to the byte-stub, and
  * with one (here: an injected deterministic fake standing in for the
  * reflective jcodec adapter) it routes video rows through the decoder.
  */
class MediaVideoGateSpec extends SparkSuite {
  implicit lazy val s: org.apache.spark.sql.SparkSession = spark
  import SparkSuite.session.implicits._

  private lazy val media = Media.fromDocuments(graft.Tables.documents(spark, sf))

  test("gate probe is consistent with the resolved decoder") {
    assert(Media.videoCodecAvailable == Media.defaultVideoDecoder.nonEmpty)
    // this container ships no video codec — the honest state the stub
    // documents; if a codec jar appears, defaultVideoDecoder flips with it
    if (!Media.videoCodecAvailable) assert(Media.defaultVideoDecoder.isEmpty)
  }

  test("no codec: videoFrames equals the byte-stub sampling") {
    val gated = Media.videoFrames(media, stride = 2, decoder = None)
      .collect().map(f => (f.media_id, f.frame_no, f.frame_bytes.toSeq)).sortBy(x => (x._1, x._2))
    val stub = Media.sampleFrames(media, stride = 2)
      .collect().map(f => (f.media_id, f.frame_no, f.frame_bytes.toSeq)).sortBy(x => (x._1, x._2))
    assert(gated.sameElements(stub))
  }

  test("with a codec: video rows route through the decoder, others pass through") {
    // deterministic fake codec: frames are fixed 8-byte slices
    val fake: Media.FrameDecoder =
      bytes => bytes.grouped(8).filter(_.length == 8)
    val frames = Media.videoFrames(media, stride = 3, decoder = Some(fake)).cache()
    val videoIds = media.filter(_.kind == "video")
      .collect().map(_.media_id).toSet
    val byId = frames.collect().groupBy(_.media_id)
    // every decoded frame index honors the stride
    assert(byId.filter(kv => videoIds.contains(kv._1))
      .forall(_._2.forall(f => f.frame_no % 3 == 0 && f.frame_bytes.length == 8)))
    // non-video rows are untouched single frames
    val doc1 = media.filter(_.media_id == 1).collect().head
    if (!videoIds.contains(1L))
      assert(byId(1L).head.frame_bytes.toSeq == doc1.bytes.toSeq)
    frames.unpersist()
  }
}
