package graft.multimodal

import graft.SparkSuite
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Perceptual-hash near-dup detection over REAL decoded pixels: a
  * re-encoded/slightly-perturbed copy must land within the Hamming
  * budget, an unrelated image must not, and the band-bucket candidate
  * generator must be complete for the budget (pigeonhole contract).
  */
class MediaPHashSpec extends SparkSuite {
  private implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  /** Gradient image with a tweakable corner patch. */
  private def grad(w: Int, h: Int, patch: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val v = (255 * x / math.max(w - 1, 1)) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
    }
    // perturb a small corner patch (keeps most aHash cells stable)
    (0 until 3).foreach(y => (0 until 3).foreach(x =>
      img.setRGB(x, y, patch)))
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  private def checker(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x =>
      img.setRGB(x, y, if ((x / 4 + y / 4) % 2 == 0) 0xffffff else 0)))
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  private def mediaOf(rows: (Long, Array[Byte])*) = {
    import spark.implicits._
    rows.toSeq.map { case (id, b) => Media.MediaRow(id, "image", b, 0, 0) }.toDS()
  }

  test("perturbed copy is a near-dup; unrelated image is not") {
    val ds = mediaOf(
      (1L, grad(64, 64, 0x000000)),
      (2L, grad(64, 64, 0x202020)),   // mildly-perturbed corner
      (3L, checker(64, 64)),          // structurally different
      (4L, Array[Byte](9, 9, 9)))     // undecodable → dropped
    val pairs = Media.imageNearDups(ds, maxHamming = 6).collect()
    val ids = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids.contains((1L, 2L)), s"expected (1,2) near-dup, got ${ids.mkString(",")}")
    assert(!ids.exists(p => p._1 == 3L || p._2 == 3L),
      s"checkerboard must not pair with the gradient: ${ids.mkString(",")}")
  }

  test("identical bytes give hamming 0 and the generator is complete at 0") {
    val b = grad(32, 32, 0x000000)
    val pairs = Media.imageNearDups(mediaOf((10L, b), (11L, b)), maxHamming = 0)
      .collect()
    assert(pairs.length === 1)
    assert(pairs.head.getAs[Int]("hamming") === 0)
  }

  test("aHash is deterministic and decode-failure-safe") {
    val b = grad(16, 16, 0x000000)
    assert(Media.aHash64(b) === Media.aHash64(b))
    assert(Media.aHash64(Array[Byte](1, 2, 3)).isEmpty)
  }
}
