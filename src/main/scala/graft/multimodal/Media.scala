package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column support: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batched feature extraction.
  *
  * Decode tiers:
  *  - IMAGE: REAL decode via `javax.imageio` (PNG/JPEG/BMP/GIF readers
  *    ship inside every Java SE runtime — no external library), including
  *    pixel-true resize re-encoded as PNG.
  *  - AUDIO: REAL WAV/PCM decode via `javax.sound.sampled` (also JDK
  *    built-in): sample rate, channels, frame count, RMS amplitude.
  *  - VIDEO: byte-level STUB (`decodeStub`, `sampleFrames`) — the JDK has
  *    no video codec; the batch shape and schema are the swap-in contract.
  *
  * Scale notes: feature extraction is mapPartitions (no shuffle, no
  * driver collect); binary payloads never enter a shuffle — only the
  * compact feature rows do. Rows stream through the kernels one at a
  * time (the iterators are never materialized into batches), so peak
  * memory per task is one blob regardless of partition size.
  */
object Media {

  // BufferedImage/Graphics2D are pure software on byte buffers — never
  // let a misconfigured DISPLAY make executors try to open one
  System.setProperty("java.awt.headless", "true")

  /** One media object: opaque bytes + envelope metadata. */
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
                      width: Int, height: Int)

  /** Extracted per-object features (fixed-width, shuffle-friendly). */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           byte_mean: Double, hist: Array[Long])

  /** One sampled "frame" of a media object. */
  case class Frame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

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

  /** Partition-wise feature extraction — the mapInPandas analogue: each
    * task streams its partition through the decode kernel row by row
    * (grouping rows into batches would pin `batch` blobs live at once —
    * with 100 MB media that RAISES peak memory, the opposite of what the
    * round-2 comment claimed) and emits compact feature rows.
    */
  def extractFeatures(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val (mean, hist) = decodeStub(m.bytes)
        MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong, mean, hist)
      }
    }
  }

  /** Frame sampling for `video` rows: every `stride`-th 64-byte slice
    * becomes a frame row (STUB for real frame extraction); non-video rows
    * pass through untouched as a single frame.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int)(implicit spark: SparkSession): Dataset[Frame] = {
    require(stride > 0, s"stride must be positive, got $stride")
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

  // ==== REAL decode tier (JDK built-in codecs) ==============================

  /** Per-image features from actual pixel data. */
  case class ImageFeatures(media_id: Long, width: Int, height: Int,
                           mean_r: Double, mean_g: Double, mean_b: Double,
                           luma_hist: Array[Long])

  /** Per-clip features from actual PCM samples. */
  case class AudioFeatures(media_id: Long, sample_rate: Double, channels: Int,
                           n_frames: Long, rms: Double)

  /** Decode one image via javax.imageio; None when no installed reader
    * accepts the bytes (corrupt blob, unknown container).
    */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Double, Double, Double, Array[Long])] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      val hist = new Array[Long](16)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          sr += r; sg += g; sb += b
          // integer ITU-R 601 luma; >>4 buckets into 16 bins
          hist(((77 * r + 150 * g + 29 * b) >> 8) >> 4) += 1
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      Some((w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, hist))
    }
  }

  /** Pixel-true resize: decode, scale with bilinear Graphics2D, re-encode
    * as PNG. Bytes no reader accepts pass through unchanged.
    */
  def resizeImageBytes(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) bytes
    else {
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = out.createGraphics()
      g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g2.drawImage(img, 0, 0, w, h, null)
      g2.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", baos)
      baos.toByteArray
    }
  }

  /** Decode WAV/PCM via javax.sound.sampled: (rate, channels, frames, rms)
    * with RMS normalized to [0, 1] over 16-bit samples.
    */
  def decodeWav(bytes: Array[Byte]): Option[(Double, Int, Long, Double)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(bytes)))
      val fmt = in.getFormat
      val data = in.readAllBytes()
      in.close()
      val bytesPerSample = fmt.getSampleSizeInBits / 8
      if (bytesPerSample != 2) Some((fmt.getSampleRate.toDouble,
        fmt.getChannels, in.getFrameLength, Double.NaN))
      else {
        val big = fmt.isBigEndian
        var i = 0; var acc = 0.0; var n = 0L
        while (i + 1 < data.length) {
          val s =
            if (big) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort
            else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
          val v = s / 32768.0
          acc += v * v; n += 1; i += 2
        }
        Some((fmt.getSampleRate.toDouble, fmt.getChannels,
          n / math.max(fmt.getChannels, 1),
          if (n == 0) 0.0 else math.sqrt(acc / n)))
      }
    } catch { case _: Exception => None }

  /** Real-image feature extraction: same streaming mapPartitions shape
    * as `extractFeatures`, undecodable rows dropped (count them upstream
    * via a left-anti if the pipeline needs dead-letter accounting).
    */
  def imageFeatures(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap({ m =>
        decodeImage(m.bytes).map { case (w, h, r, g, b, hist) =>
          ImageFeatures(m.media_id, w, h, r, g, b, hist)
        }
      })
    }
  }

  /** Pixel-true distributed resize; only decodable rows are transformed. */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val out = resizeImageBytes(m.bytes, w, h)
        if (out eq m.bytes) m else m.copy(bytes = out, width = w, height = h)
      }
    }
  }

  /** 64-bit average-hash (aHash) perceptual fingerprint: decode, bilinear
    * resize to 8×8, integer ITU-R 601 luma per cell, bit i set iff
    * luma_i > mean. Robust to re-encoding, mild blur and resize — the
    * near-dup signal pixel-exact fingerprints miss. None when no reader
    * accepts the bytes.
    */
  def aHash64(bytes: Array[Byte]): Option[Long] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val small = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = small.createGraphics()
      g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g2.drawImage(img, 0, 0, 8, 8, null)
      g2.dispose()
      val luma = new Array[Int](64)
      var i = 0; var sum = 0L
      while (i < 64) {
        val rgb = small.getRGB(i % 8, i / 8)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        luma(i) = (77 * r + 150 * g + 29 * b) >> 8
        sum += luma(i); i += 1
      }
      // exact integer mean comparison: luma_i * 64 > sum avoids the
      // truncated-average boundary drifting with rounding mode
      var h = 0L; i = 0
      while (i < 64) { if (luma(i).toLong * 64 > sum) h |= (1L << i); i += 1 }
      Some(h)
    }
  }

  /** Per-image perceptual hashes (mapPartitions, undecodable rows drop). */
  def imageHashes(media: Dataset[MediaRow])(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(m => aHash64(m.bytes).map(h => (m.media_id, h)))
    }.toDF("media_id", "ahash")
  }

  /** Near-duplicate image pairs with Hamming distance ≤ `maxHamming`
    * (< 16): the 64-bit hash splits into four 16-bit bands, and any two
    * hashes within ≤ 15 flipped bits share at least one UNTOUCHED band
    * (pigeonhole over 4 bands) — so banding by exact band value is a
    * complete candidate generator, the same blocked-not-all-pairs shape
    * as MinHash LSH. Candidates expand as in-bucket i<j pairs (buckets
    * are near-dup families — small), then one popcount verifies the
    * exact distance. Binary payloads never shuffle; only (id, 64-bit
    * hash) rows do.
    */
  def imageNearDups(media: Dataset[MediaRow], maxHamming: Int = 3)
                   (implicit spark: SparkSession): DataFrame =
    bandedHammingPairs(
      imageHashes(media).withColumnRenamed("ahash", "h64"), maxHamming)

  /** The shared banded near-dup candidate generator over any 64-bit
    * perceptual hash column `h64`: four 16-bit bands, pigeonhole
    * completeness at Hamming ≤ 15, in-bucket i<j expansion, one popcount
    * verify — see [[imageNearDups]]'s scaladoc for the argument. Input
    * (media_id, h64); output (id_a, id_b, hamming).
    */
  def bandedHammingPairs(hashes: DataFrame, maxHamming: Int): DataFrame =
    pairsFromBanded(band64(hashes), maxHamming)

  /** The 16-bit band projection of a 64-bit perceptual hash table —
    * (media_id, h64, band, band_val), one row per (print, band). This is
    * the PERSISTABLE multimodal dedup artifact (the `minhashBandIndex`
    * shape for fingerprints): a pure per-print function of the fixed
    * banding, so streamed appends ≡ one-pass rebuild and the
    * [[MediaStore]] lifecycle (ingest/forget/compact/rotate) applies.
    */
  def band64(hashes: DataFrame): DataFrame =
    hashes.select(col("media_id"), col("h64"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("h64"), b * 16)
          .bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_val")

  /** The candidate-expand + popcount-verify tail over an already-banded
    * print table ([[band64]] rows, possibly served from a maintained
    * [[MediaStore]]): in-bucket i<j expansion, exact Hamming verify.
    */
  def pairsFromBanded(banded: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming < 16, "pigeonhole over 4 bands covers hamming <= 15")
    banded
      .groupBy("band", "band_val")
      .agg(sort_array(collect_list(struct(col("media_id"), col("h64"))))
        .as("ms"))
      .filter(size(col("ms")) >= 2)
      .select(explode(graft.operators.TextDedup.expandSortedPairs(col("ms"),
        (x, y) => struct(
          x("media_id").as("id_a"), y("media_id").as("id_b"),
          bit_count(x("h64").bitwiseXOR(y("h64"))).as("hamming")))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.hamming").as("hamming"))
      .distinct() // the same pair can collide in several bands
      .filter(col("hamming") <= maxHamming)
  }

  /** Integer energy contour of a 16-bit PCM clip: total sum-of-squares per
    * window over `windows` equal-length windows (remainder samples
    * dropped). Exact Long arithmetic — 2^31 max per sample² and ~2^20
    * samples per window stay far from overflow. None when the bytes
    * aren't decodable audio or are too short to fill every window.
    */
  def audioEnergyContour(bytes: Array[Byte], windows: Int): Option[Array[Long]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(bytes)))
      val fmt = in.getFormat
      val data = in.readAllBytes()
      in.close()
      if (fmt.getSampleSizeInBits != 16) None
      else {
        val big = fmt.isBigEndian
        val nSamples = data.length / 2
        val w = nSamples / windows
        if (w == 0) None
        else {
          val e = new Array[Long](windows)
          var s = 0
          while (s < w * windows) {
            val i = 2 * s
            val v: Long =
              if (big) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort.toLong
              else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort.toLong
            e(s / w) += v * v
            s += 1
          }
          Some(e)
        }
      }
    } catch { case _: Exception => None }

  /** 64-bit audio fingerprint: the sign pattern of consecutive
    * energy-contour deltas over 65 windows (bit i set iff window i+1 is
    * strictly louder than window i) — the energy-delta scheme classic
    * audio fingerprinters build on. Comparing energies instead of using
    * them makes the print invariant under uniform volume scaling and
    * robust to re-encoding; like [[aHash64]] it is a recall device for
    * the banded near-dup join, not an identifier.
    */
  def audioFingerprint64(bytes: Array[Byte]): Option[Long] =
    audioEnergyContour(bytes, 65).map { e =>
      var h = 0L; var i = 0
      while (i < 64) { if (e(i + 1) > e(i)) h |= (1L << i); i += 1 }
      h
    }

  /** Per-clip audio fingerprints (mapPartitions, undecodable rows drop). */
  def audioFingerprints(media: Dataset[MediaRow])(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(m => audioFingerprint64(m.bytes).map(h => (m.media_id, h)))
    }.toDF("media_id", "h64")
  }

  /** Near-duplicate audio pairs: the [[imageNearDups]] pigeonhole band
    * join over [[audioFingerprint64]] prints. Same scale contract —
    * binary payloads never shuffle, only (id, hash) rows do.
    */
  def audioNearDups(media: Dataset[MediaRow], maxHamming: Int = 3)
                   (implicit spark: SparkSession): DataFrame =
    bandedHammingPairs(audioFingerprints(media), maxHamming)

  /** Real-audio feature extraction (WAV/PCM), streaming per row. */
  def audioFeatures(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap({ m =>
        decodeWav(m.bytes).map { case (rate, ch, frames, rms) =>
          AudioFeatures(m.media_id, rate, ch, frames, rms)
        }
      })
    }
  }

  // ==== VIDEO tier: codec-detection gate ===================================

  /** A frame decoder: full media bytes → iterator of encoded frame bytes.
    * Must be a serializable function — it ships to executors.
    */
  type FrameDecoder = Array[Byte] => Iterator[Array[Byte]]

  /** Pure-Java video codecs the gate recognizes on the classpath. The JDK
    * ships none, so availability is a deployment choice (drop the jar on
    * the executor classpath and the gate flips with no code change).
    */
  private val VideoCodecProbes = Seq("org.jcodec.api.FrameGrab")

  /** First probe class present on the classpath, if any. */
  lazy val videoCodecClass: Option[String] =
    VideoCodecProbes.find { cn =>
      try { Class.forName(cn, false, getClass.getClassLoader); true }
      catch { case _: Throwable => false }
    }

  def videoCodecAvailable: Boolean = videoCodecClass.nonEmpty

  /** Reflective jcodec adapter (no compile-time dependency): FrameGrab
    * over an in-memory channel, frames surfaced as their luma plane.
    * Every reflective lookup happens inside the returned closure, on the
    * executor, and any per-row failure yields an empty iterator — a
    * corrupt clip drops its frames, it doesn't kill the task.
    */
  private def jcodecDecoder: FrameDecoder = (bytes: Array[Byte]) =>
    try {
      val chCls = Class.forName("org.jcodec.common.io.ByteBufferSeekableByteChannel")
      val ch = chCls
        .getConstructor(classOf[java.nio.ByteBuffer], classOf[Int])
        .newInstance(java.nio.ByteBuffer.wrap(bytes), Integer.valueOf(bytes.length))
      val grab = Class.forName("org.jcodec.api.FrameGrab")
        .getMethod("createFrameGrab", Class.forName("org.jcodec.common.io.SeekableByteChannel"))
        .invoke(null, ch.asInstanceOf[Object])
      val getFrame = grab.getClass.getMethod("getNativeFrame")
      val planeData = Class.forName("org.jcodec.common.model.Picture")
        .getMethod("getPlaneData", classOf[Int])
      // frame fetch AND plane extraction both inside the per-frame trap:
      // these frames are consumed lazily inside flatMap, so anything
      // thrown here later — a truncated clip mid-stream, a plane the
      // color format doesn't carry — must end this clip's frame stream,
      // not escape and kill the task
      Iterator.continually(
          try {
            val pic = getFrame.invoke(grab)
            if (pic == null) null
            else planeData.invoke(pic, Integer.valueOf(0)).asInstanceOf[Array[Byte]]
          } catch { case _: Throwable => null })
        .takeWhile(_ != null)
    } catch { case _: Throwable => Iterator.empty }

  /** Driver-side probe that the reflective signatures the adapter needs
    * exist in the deployed jcodec version (driver and executors share a
    * classpath). Without it, a version with FrameGrab present but
    * different signatures would pass the class gate and then silently
    * decode zero frames for every clip; failing the probe falls back to
    * the stub path instead.
    */
  private def jcodecSignaturesResolve: Boolean =
    try {
      Class.forName("org.jcodec.common.io.ByteBufferSeekableByteChannel")
        .getConstructor(classOf[java.nio.ByteBuffer], classOf[Int])
      Class.forName("org.jcodec.api.FrameGrab")
        .getMethod("createFrameGrab", Class.forName("org.jcodec.common.io.SeekableByteChannel"))
      Class.forName("org.jcodec.common.model.Picture")
        .getMethod("getPlaneData", classOf[Int])
      true
    } catch { case _: Throwable => false }

  /** The decoder the gate resolves for this JVM: a real codec when one is
    * installed AND its signatures resolve, None (→ byte-stub path)
    * otherwise.
    */
  def defaultVideoDecoder: Option[FrameDecoder] =
    videoCodecClass.collect {
      case "org.jcodec.api.FrameGrab" if jcodecSignaturesResolve => jcodecDecoder
    }

  /** Frame extraction for video rows, every `stride`-th frame kept:
    * decodes real frames when a codec is available (or injected — tests
    * exercise the real path with a deterministic fake), byte-stub slices
    * otherwise. Non-video rows pass through as a single frame either way.
    */
  def videoFrames(media: Dataset[MediaRow], stride: Int,
                  decoder: Option[FrameDecoder] = defaultVideoDecoder)
                 (implicit spark: SparkSession): Dataset[Frame] = {
    require(stride > 0, s"stride must be positive, got $stride")
    decoder match {
      case None => sampleFrames(media, stride)
      case Some(dec) =>
        import spark.implicits._
        media.flatMap { m =>
          if (m.kind == "video")
            dec(m.bytes).zipWithIndex.collect {
              case (fb, i) if i % stride == 0 => Frame(m.media_id, i, fb)
            }
          else Iterator.single(Frame(m.media_id, 0, m.bytes))
        }
    }
  }
}
