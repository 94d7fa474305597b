package graft.multimodal

import graft.SparkSuite
import java.io.ByteArrayOutputStream
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
import org.apache.spark.sql.SparkSession

/** Audio near-dup fingerprinting: energy-delta invariants and the banded
  * Hamming join's completeness boundary.
  */
class MediaAudioDupSpec extends SparkSuite {
  implicit lazy val s: SparkSession = spark
  import spark.implicits._

  /** 16-bit mono PCM square wave whose amplitude follows `env`, each env
    * value held for `w` frames — one env block per contour window when
    * env.length == 65.
    */
  private def wavEnv(env: Seq[Short], w: Int = 64, rate: Float = 8000f): Array[Byte] = {
    val n = env.length * w
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val a = env(i / w)
      val v: Short = if (i % 2 == 0) a else (-a).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  private def mediaOf(rows: (Long, Array[Byte])*): org.apache.spark.sql.Dataset[Media.MediaRow] =
    rows.map { case (id, b) => Media.MediaRow(id, "audio", b, 0, 0) }.toDS()

  private val rampUp: Seq[Short] = (1 to 65).map(k => (100 * k).toShort)
  private val rampHalf: Seq[Short] = rampUp.map(a => (a / 2).toShort)
  private val rampSwap: Seq[Short] = {
    val a = rampUp.toArray
    val t = a(10); a(10) = a(11); a(11) = t
    a.toSeq
  }

  test("fingerprint is invariant under uniform volume scaling") {
    val a = Media.audioFingerprint64(wavEnv(rampUp)).get
    val b = Media.audioFingerprint64(wavEnv(rampHalf)).get
    assert(a === b, "half-volume clip must print identically")
    assert(a === -1L, "a strictly rising contour sets all 64 delta bits")
  }

  test("audioNearDups pairs the scaled clip at hamming 0 and the locally " +
    "perturbed clip at hamming 1; the reversed clip is not even a candidate") {
    val media = mediaOf(
      1L -> wavEnv(rampUp), 2L -> wavEnv(rampHalf),
      3L -> wavEnv(rampSwap), 4L -> wavEnv(rampUp.reverse),
      5L -> Array[Byte](1, 2, 3)) // undecodable: must drop, not fail
    val pairs = Media.audioNearDups(media, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs === Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)))
  }

  test("banded join is complete at hamming <= 15 (pigeonhole boundary)") {
    val base = 0x123456789abcdefL
    // 15 flips confined to 3 bands leave band 3 untouched -> must be found
    val in3bands = base ^ 0x3FFF00000001L // 14+1 bits across bands 2 and 0
    val hashes = Seq((1L, base), (2L, in3bands)).toDF("media_id", "h64")
    val got = Media.bandedHammingPairs(hashes, maxHamming = 15)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 2L, 15)))
  }
}
