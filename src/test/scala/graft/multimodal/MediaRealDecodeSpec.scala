package graft.multimodal

import graft.SparkSuite
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}

/** Real-decode verification: fixtures are genuine PNG/JPEG/WAV blobs
  * produced with the same JDK codecs the operators decode with, run
  * through the distributed mapPartitions pipeline (not driver-local).
  */
class MediaRealDecodeSpec extends SparkSuite {
  private implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  private def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  /** 16-bit mono PCM square wave at half amplitude → RMS exactly 0.5. */
  private def wav(nFrames: Int, rate: Float = 8000f): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * 2)
    (0 until nFrames).foreach { i =>
      val v: Short = if (i % 2 == 0) 16384 else -16384
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val baos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  private def mediaOf(rows: (Long, String, Array[Byte])*) = {
    import spark.implicits._
    rows.toSeq.map { case (id, kind, b) => Media.MediaRow(id, kind, b, 0, 0) }.toDS()
  }

  test("imageFeatures decodes real PNG and JPEG pixels") {
    val red = 0xff0000
    val ds = mediaOf((1L, "image", png(8, 6, red)), (2L, "image", jpeg(10, 4, red)),
      (3L, "image", Array[Byte](1, 2, 3))) // undecodable → dropped
    val got = Media.imageFeatures(ds).collect().sortBy(_.media_id)
    assert(got.map(f => (f.media_id, f.width, f.height)).toSeq ==
      Seq((1L, 8, 6), (2L, 10, 4)))
    val p = got(0)
    assert(p.mean_r == 255.0 && p.mean_g == 0.0 && p.mean_b == 0.0)
    // solid red: every pixel lands in one luma bucket (luma 76 → bucket 4)
    assert(p.luma_hist(4) == 48L && p.luma_hist.sum == 48L)
    val j = got(1) // JPEG is lossy: near-red, not exact
    assert(j.mean_r > 220 && j.mean_g < 40 && j.mean_b < 40)
  }

  test("resizeImages is pixel-true: re-decode confirms new dims and colors") {
    val ds = mediaOf((1L, "image", png(16, 12, 0x00ff00)))
    val resized = Media.resizeImages(ds, 4, 3).collect()(0)
    assert(resized.width == 4 && resized.height == 3)
    val Some((w, h, r, g, b, _)) = Media.decodeImage(resized.bytes)
    assert((w, h) == (4, 3))
    assert(g == 255.0 && r == 0.0 && b == 0.0)
  }

  test("audioFeatures decodes real WAV: rate, frames, exact square-wave RMS") {
    val ds = mediaOf((7L, "audio", wav(4000)), (8L, "audio", Array[Byte](9, 9)))
    val got = Media.audioFeatures(ds).collect()
    assert(got.length == 1)
    val a = got(0)
    assert(a.media_id == 7L && a.sample_rate == 8000.0 && a.channels == 1)
    assert(a.n_frames == 4000L)
    assert(a.rms == 0.5)
  }
}
