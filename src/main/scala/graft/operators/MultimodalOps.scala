package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed media payload: opaque bytes + structured metadata — the
  * storage shape for image/audio/video columns in a training-data lake
  * (binary column with typed metadata struct; parquet stores the bytes
  * contiguously and prunes the metadata independently). */
final case class MediaPayload(
    media_id: Long, format: String,
    width: Int, height: Int, sample_rate: Int,
    data: Array[Byte])

/** Extracted per-media features. `width`/`height` are the decoded
  * pixel dimensions (0 when the payload is not a decodable image);
  * `thumbnail` is a real 8x8 grayscale downsample for decoded images,
  * or the first-8-bytes fallback for non-image payloads. */
final case class MediaFeatures(
    media_id: Long, format: String, n_bytes: Int,
    width: Int, height: Int,
    mean_byte: Double, entropy_proxy: Double,
    thumbnail: Array[Byte])

/** A decoded-and-resized image: source dimensions plus the re-encoded
  * PNG at the requested output size. */
final case class ResizedMedia(
    media_id: Long, format: String,
    src_width: Int, src_height: Int,
    width: Int, height: Int,
    png: Array[Byte])

/** Multimodal column plumbing: schema, partition-friendly batch
  * processing, decode/resize/frame-sample operators.
  *
  * Image decode is REAL for PNG/JPEG/GIF/BMP via the JDK's
  * `javax.imageio` (no external dependency): real width/height and a
  * deterministic 8x8 grayscale thumbnail. Audio/video codecs are not
  * in the JDK, so those payloads take the byte-level fallback path
  * (full byte statistics, first-8-bytes thumbnail) — swapping in a
  * real codec changes only [[decodeImage]], not the pipeline shape.
  */
object MultimodalOps {

  /** Magic-byte sniff for formats the JDK can decode — cheaper and
    * more reliable than trusting a file extension at 100 TB. The BMP
    * check goes beyond the 2-byte 'BM' magic (which ordinary text can
    * start with): the DIB header size at offset 14 must be one of the
    * real variants with its high bytes zero, or a text payload could
    * be garbage-decoded into nonzero dimensions. */
  private[graft] def looksLikeImage(bytes: Array[Byte]): Boolean = {
    def at(i: Int): Int = bytes(i) & 0xff
    def bmp: Boolean =
      bytes.length >= 18 && at(0) == 'B' && at(1) == 'M' &&
        Set(12, 40, 56, 64, 108, 124).contains(at(14)) &&
        at(15) == 0 && at(16) == 0 && at(17) == 0
    bytes.length >= 8 && (
      (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') ||
      (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) ||          // JPEG
      (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') ||
      bmp)
  }

  /** Decode an encoded image and produce (width, height, 8x8 gray
    * thumbnail). The thumbnail samples pixel (floor(x*w/8),
    * floor(y*h/8)) per cell and converts with integer luma
    * ((77r + 150g + 29b) >> 8) — deliberately hand-rolled instead of
    * AWT's scaler so the bytes are deterministic across JVMs. Returns
    * None for undecodable payloads. */
  private[graft] def decodeImage(bytes: Array[Byte])
      : Option[(Int, Int, Array[Byte])] = {
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val thumb = new Array[Byte](64)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val rgb = img.getRGB(x * w / 8, y * h / 8)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            thumb(y * 8 + x) = ((77 * r + 150 * g + 29 * b) >> 8).toByte
            x += 1
          }
          y += 1
        }
        Some((w, h, thumb))
      }
      // NonFatal, not just IOException: the JDK BMP/GIF/JPEG readers
      // throw unchecked exceptions (IllegalArgumentException, CMM/
      // IndexOutOfBounds) on malformed bodies — at 100 TB of untrusted
      // payloads one adversarial file must not kill the job
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** RIFF/WAVE magic sniff (mirrors [[looksLikeImage]]). */
  private[graft] def looksLikeWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
      b(11) == 'E'

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** REAL audio decode for PCM WAV — a hand-rolled RIFF chunk walk
    * (byte-level, deterministic, no codec library): returns
    * (sampleRate, channels, bitsPerSample, nSamples, rms) for 8-bit
    * unsigned / 16-bit signed little-endian PCM, None for anything
    * else (compressed formats keep the byte-stat fallback path, the
    * same split as image decode). nSamples counts per-channel frames x
    * channels (raw samples); rms is over the integer sample domain
    * (8-bit values centered by -128), with the sum of squares in
    * exact integer arithmetic — order-independent. Truncated data
    * chunks clip to the real payload instead of failing: one ragged
    * file must not kill a 100 TB scan. */
  /** The RIFF chunk walk shared by [[decodeWav]] and [[audioWindows]]:
    * locates the PCM data region for the first `data` chunk following
    * a supported `fmt ` chunk. Returns (rate, channels, bits, start
    * offset, clipped byte length). */
  private def wavPcmRegion(bytes: Array[Byte])
      : Option[(Int, Int, Int, Int, Int)] = {
    if (!looksLikeWav(bytes)) return None
    val n = bytes.length
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
    var result: Option[(Int, Int, Int, Int, Int)] = None
    while (pos + 8 <= n && result.isEmpty) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val size = le32(bytes, pos + 4).toInt
      if (id == "fmt " && pos + 8 + 16 <= n) {
        val audioFormat = le16(bytes, pos + 8)
        val channels = le16(bytes, pos + 10)
        val rate = le32(bytes, pos + 12).toInt
        val bits = le16(bytes, pos + 22)
        if (audioFormat == 1 && channels > 0 &&
            (bits == 8 || bits == 16))
          fmt = Some((channels, rate, bits))
      } else if (id == "data") {
        fmt.foreach { case (channels, rate, bits) =>
          val start = pos + 8
          val len = math.max(0, math.min(size, n - start))
          result = Some((rate, channels, bits, start, len))
        }
      }
      if (result.isEmpty) pos += 8 + size + (size & 1) // word-aligned
    }
    result
  }

  /** Sample i (raw interleaved order) of the located PCM region, in
    * the centered integer domain (8-bit unsigned recentered by -128,
    * 16-bit signed as-is). */
  @inline private def pcmSample(bytes: Array[Byte], start: Int,
                                bits: Int, i: Int): Int =
    if (bits == 8) (bytes(start + i) & 0xff) - 128
    else le16(bytes, start + 2 * i).toShort.toInt

  private[graft] def decodeWav(bytes: Array[Byte])
      : Option[(Int, Int, Int, Long, Double)] =
    wavPcmRegion(bytes).map { case (rate, channels, bits, start, len) =>
      val nSamples = (len / (bits / 8)).toLong
      var sumSq = 0L
      var i = 0
      while (i < nSamples) {
        val v = pcmSample(bytes, start, bits, i)
        sumSq += v.toLong * v
        i += 1
      }
      val rms =
        if (nSamples == 0) 0.0
        else math.sqrt(sumSq.toDouble / nSamples)
      (rate, channels, bits, nSamples, rms)
    }

  /** Audio feature extraction: REAL PCM-WAV decode (header facts +
    * exact-integer RMS) for payloads whose magic says RIFF/WAVE;
    * every other payload keeps zeros with is_wav=false — swapping in
    * codec decoders changes only [[decodeWav]], not the pipeline
    * shape (the image-decode split, applied to audio). Runs
    * per-partition like [[extractFeatures]]. */
  def audioFeatures(media: Dataset[MediaPayload]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { p =>
        decodeWav(p.data) match {
          case Some((rate, ch, bits, ns, rms)) =>
            (p.media_id, p.format, true, rate, ch, bits, ns, rms)
          case None =>
            (p.media_id, p.format, false, 0, 0, 0, 0L, 0.0)
        }
      }
    }.toDF("media_id", "format", "is_wav", "sample_rate", "channels",
      "bits", "n_samples", "rms")
  }

  /** Windowed PCM features — the speech/audio curation signals
    * (silence trimming, music-vs-speech gates, clipping detection)
    * need per-frame-window stats, not one whole-file RMS. Cuts the
    * decoded stream into fixed windows of `windowFrames` per-channel
    * frames and emits, per window: exact-integer RMS over all
    * channels, zero crossings of channel 0 (sign flips between
    * consecutive frames, zero treated as non-negative), and the peak
    * absolute sample. One streaming pass over the payload bytes — no
    * sample array is materialized, so a multi-GB file costs O(window)
    * memory. Non-WAV payloads emit no rows (same split as
    * [[audioFeatures]]). Output: media_id, window_idx, n_frames, rms,
    * zero_crossings, peak. */
  def audioWindows(media: Dataset[MediaPayload], windowFrames: Int)
      : DataFrame = {
    require(windowFrames > 0, s"bad window $windowFrames")
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { p =>
        wavPcmRegion(p.data) match {
          case None => Iterator.empty
          case Some((_, channels, bits, start, len)) =>
            val nFrames = len / (bits / 8) / channels
            (0 until ((nFrames + windowFrames - 1) / windowFrames))
              .iterator.map { w =>
                val f0 = w * windowFrames
                val f1 = math.min(f0 + windowFrames, nFrames)
                var sumSq = 0L
                var zc = 0
                var peak = 0
                var prevSign = 0 // sign of the previous ch-0 sample
                var f = f0
                while (f < f1) {
                  var c = 0
                  while (c < channels) {
                    val v = pcmSample(p.data, start, bits, f * channels + c)
                    sumSq += v.toLong * v
                    if (math.abs(v) > peak) peak = math.abs(v)
                    if (c == 0) {
                      val s = if (v < 0) -1 else 1
                      if (f > f0 && s != prevSign) zc += 1
                      prevSign = s
                    }
                    c += 1
                  }
                  f += 1
                }
                val n = (f1 - f0).toLong * channels
                val rms = if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n)
                (p.media_id, w, f1 - f0, rms, zc, peak)
              }
        }
      }
    }.toDF("media_id", "window_idx", "n_frames", "rms",
      "zero_crossings", "peak")
  }

  /** 64-bit perceptual hash (aHash) over an 8x8 grayscale thumbnail
    * column (the [[decodeImage]] output): bit i is set iff pixel_i *
    * 64 >= sum(pixels) — the mean compare kept in exact integers so
    * the hash is engine-reproducible. Near-identical images differ in
    * a few bits; pair detection composes with
    * [[DedupOps.fingerprintNearDup]] (band + Hamming verify). Pure
    * column expression: byte i is read with substring+hex+conv, the
    * pixel array enters the bit fold as a collection argument
    * (evaluated once — the CLAUDE.md lambda rule). */
  def perceptualHash64(thumb: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val px = transform(sequence(lit(0), lit(63)),
      i => conv(hex(substring(thumb, (i + 1).cast("int"), lit(1))), 16, 10)
        .cast("long"))
    // two nested 1-element transforms bind the pixel array and its sum
    // as lambda variables, so each is evaluated ONCE per row — the
    // resizeStub collection-argument idiom, twice
    element_at(transform(array(px), p =>
      element_at(transform(array(aggregate(p, lit(0L), (a, x) => a + x)),
        total => aggregate(
          zip_with(p, sequence(lit(0), lit(63)), (x, i) =>
            when(x * 64 >= total,
              call_function("shiftleft", lit(1L), i.cast("int")))
              .otherwise(lit(0L))),
          lit(0L), (a, x) => a.bitwiseOR(x))), 1)), 1)
  }

  /** Attach a synthetic media payload to any id+text DataFrame (the
    * testdata ships no real binaries): bytes are the UTF-8 text,
    * metadata derived deterministically. */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("img"), lit("audio"), lit("video")),
        (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("format"),
      (pmod(col(idCol).cast("long"), lit(64)) + 1).cast("int").as("width"),
      (pmod(col(idCol).cast("long"), lit(48)) + 1).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      encode(col(textCol), "UTF-8").as("data"))

  /** Feature extraction: byte statistics for every payload, plus a
    * REAL image decode (javax.imageio — PNG/JPEG/GIF/BMP) for
    * payloads whose magic bytes say they are images: decoded
    * width/height and a deterministic 8x8 grayscale thumbnail.
    * Non-image payloads (audio/video/opaque) keep width=height=0 and
    * a first-8-bytes fallback thumbnail. Runs per-partition (one
    * JVM-side batch per partition — the Scala analogue of mapInPandas
    * batching), with the codec's disk cache disabled once per
    * partition. */
  def extractFeatures(media: Dataset[MediaPayload]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition codec setup: no temp-file cache on executors
      javax.imageio.ImageIO.setUseCache(false)
      batch.map { p =>
        val bytes = p.data
        val n = bytes.length
        var sum = 0L
        val counts = new Array[Int](256)
        var i = 0
        while (i < n) {
          val b = bytes(i) & 0xff
          sum += b
          counts(b) += 1
          i += 1
        }
        val mean = if (n == 0) 0.0 else sum.toDouble / n
        // entropy proxy: 1 - sum((c/n)^2), a collision-probability
        // stand-in. The squared counts are accumulated in exact
        // integer arithmetic with ONE final division, so the value is
        // independent of summation order — bit-identical across
        // engines (oracle parity) and partitions.
        var sumSq = 0L
        var j = 0
        while (j < 256) {
          val c = counts(j).toLong
          sumSq += c * c
          j += 1
        }
        val coll = if (n == 0) 0.0 else sumSq.toDouble / (n.toDouble * n)
        val decoded =
          if (looksLikeImage(bytes)) decodeImage(bytes) else None
        decoded match {
          case Some((w, h, thumb)) =>
            MediaFeatures(p.media_id, p.format, n, w, h,
              mean, 1.0 - coll, thumb)
          case None =>
            MediaFeatures(p.media_id, p.format, n, 0, 0,
              mean, 1.0 - coll, bytes.take(8))
        }
      }
    }
  }

  /** Ingest a directory of raw media files through Spark's built-in
    * `binaryFile` source into the MediaPayload schema: media_id is the
    * md5-derived 32-bit hash of the file name (deterministic across
    * re-ingests and engines), format comes from the extension, and
    * dimensions stay 0 until the (stubbed) decode fills them. The
    * source is distributed and splittable BY FILE — a 100 TB media
    * lake parallelizes across files, and `pathGlobFilter` prunes
    * before any byte is read. */
  def ingestBinaryDir(spark: org.apache.spark.sql.SparkSession,
                      path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(
        // hash the BASENAME, not the full URI: the same file re-ingested
        // from a different staging dir/mount/bucket keeps its id
        CurationOps.md5Hash32(element_at(split(col("path"), "/"), -1))
          .as("media_id"),
        // extension from the BASENAME too — a dotted parent directory
        // (/data/v1.2/readme) must not leak into the format; files
        // with no extension, or a trailing dot ('dump.' splits to a
        // trailing empty segment), get the 'bin' sentinel
        when(element_at(split(col("path"), "/"), -1).contains(".") &&
            length(element_at(
              split(element_at(split(col("path"), "/"), -1), "\\."), -1)) > 0,
          lower(element_at(
            split(element_at(split(col("path"), "/"), -1), "\\."), -1)))
          .otherwise(lit("bin")).as("format"),
        lit(0).as("width"), lit(0).as("height"),
        lit(0).as("sample_rate"),
        col("content").as("data"),
        col("path"), col("length"))

  /** STUB resize: nearest-neighbor byte sampling to a fixed `outLen`
    * output (a real deployment decodes pixels and resizes; the
    * deterministic byte-level fake keeps the pipeline shape — fixed-
    * size output column, pure expression, scan speed, no shuffle).
    * Index i samples source position floor(i·n/outLen) (0-based).
    *
    * `data` enters as the COLLECTION argument of a 1-element
    * transform, so a computed payload expression evaluates ONCE per
    * row; the inner lambda only references the bound variable (free),
    * never the original column — see CLAUDE.md's lambda-body
    * re-evaluation footgun. The sample index multiplies as a LONG so
    * a multi-GB payload cannot overflow the position arithmetic. */
  def resizeStub(data: org.apache.spark.sql.Column, outLen: Int)
      : org.apache.spark.sql.Column =
    element_at(
      transform(array(data), d => {
        val n = length(d)
        aggregate(
          transform(sequence(lit(0), lit(outLen - 1)),
            i => substring(d,
              (floor((i.cast("long") * n).cast("double") / outLen) + 1)
                .cast("int"),
              lit(1))),
          lit(Array.emptyByteArray),
          (acc, b) => concat(acc, b))
      }),
      1)

  /** REAL image resize: decode via `javax.imageio`, scale with
    * bilinear `Graphics2D` interpolation, re-encode as PNG. Same
    * per-partition imperative shape as [[extractFeatures]] — decode
    * work stays on the executor that holds the payload, no shuffle,
    * and one malformed file drops its row instead of killing the job
    * (the 100 TB untrusted-payload contract). Non-image and
    * undecodable payloads are filtered out; use [[resizeStub]] when a
    * fixed-size byte column for EVERY row is required. */
  def resizeImage(media: Dataset[MediaPayload], outW: Int, outH: Int)
      : Dataset[ResizedMedia] = {
    require(outW > 0 && outH > 0, s"bad output size ${outW}x$outH")
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      javax.imageio.ImageIO.setUseCache(false)
      batch.flatMap { p =>
        if (!looksLikeImage(p.data)) None
        else try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(p.data))
          if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
          else {
            val dst = new java.awt.image.BufferedImage(outW, outH,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, outW, outH, null)
            g.dispose()
            val out = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", out)
            Some(ResizedMedia(p.media_id, p.format,
              img.getWidth, img.getHeight, outW, outH, out.toByteArray))
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    }
  }

  /** Frame sampling for "video" payloads: slice the byte stream into
    * fixed-size frames with a stride, keeping frame index — pure column
    * expressions, so sampling prunes before any decode. */
  def frameSample(df: DataFrame, dataCol: String,
                  frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = floor((length(col(dataCol)) - frameBytes) / stride) + 1
    df.withColumn("frame",
        explode(when(nFrames > 0,
          transform(sequence(lit(0), nFrames.cast("int") - 1),
            i => struct(i.as("frame_idx"),
              substring(col(dataCol), (i * stride + 1).cast("int"),
                lit(frameBytes)).as("frame_bytes"))))
          .otherwise(array())))
      .withColumn("frame_idx", col("frame.frame_idx"))
      .withColumn("frame_bytes", col("frame.frame_bytes"))
      .drop("frame")
  }
}
