package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column support: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batched feature extraction.
  *
  * The Spark-side contract is fully real — schema, encoders, partition-wise
  * batched processing (the Scala analogue of a batched pandas UDF), explode
  * of per-frame rows. The DECODE step is a clearly-marked deterministic
  * STUB (`decodeStub`): this container has no image/audio codecs, so
  * "decoding" computes byte-level statistics. Swapping in a real codec
  * changes only that one function; every plan shape stays identical.
  *
  * Scale notes: feature extraction is mapPartitions (no shuffle, no
  * driver collect); binary payloads never enter a shuffle — only the
  * compact feature rows do. Batches of `BatchSize` rows bound peak memory
  * per task regardless of blob sizes.
  */
object Media {

  /** One media object: opaque bytes + envelope metadata. */
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
                      width: Int, height: Int)

  /** Extracted per-object features (fixed-width, shuffle-friendly). */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           byte_mean: Double, hist: Array[Long])

  /** One sampled "frame" of a media object. */
  case class Frame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  val BatchSize = 64

  /** ==== STUB ==== deterministic fake decode: byte histogram (16 buckets
    * by high nibble) + mean byte value. A real implementation would decode
    * pixels/samples here; the signature and batch shape are the contract.
    */
  def decodeStub(bytes: Array[Byte]): (Double, Array[Long]) = {
    val hist = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      hist(b >> 4) += 1
      sum += b
      i += 1
    }
    (if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length, hist)
  }

  /** Build a media table from the documents corpus (deterministic fake
    * payloads: UTF-8 bytes of the text; kind round-robins image/audio/video).
    */
  def fromDocuments(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("bytes"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"))
      .as[MediaRow]
  }

  /** Batched partition-wise feature extraction — the mapInPandas analogue:
    * each task iterates its partition in fixed-size batches, runs the
    * decode kernel per batch, emits compact feature rows.
    */
  def extractFeatures(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        batch.map { m =>
          val (mean, hist) = decodeStub(m.bytes)
          MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong, mean, hist)
        }
      }
    }
  }

  /** Frame sampling for `video` rows: every `stride`-th 64-byte slice
    * becomes a frame row (STUB for real frame extraction); non-video rows
    * pass through untouched as a single frame.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int)(implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    media.flatMap { m =>
      if (m.kind == "video" && m.bytes.length > 64) {
        val n = m.bytes.length / 64
        (0 until n by stride).map { f =>
          Frame(m.media_id, f, m.bytes.slice(f * 64, f * 64 + 64))
        }
      } else Seq(Frame(m.media_id, 0, m.bytes))
    }
  }

  /** Metadata-only resize (STUB: real impl would transform pixels). */
  def resize(media: Dataset[MediaRow], w: Int, h: Int)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    media.map(m => m.copy(width = w, height = h))
  }
}
