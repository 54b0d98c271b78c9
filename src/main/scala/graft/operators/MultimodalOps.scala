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

/** Extracted per-media features. */
final case class MediaFeatures(
    media_id: Long, format: String, n_bytes: Int,
    mean_byte: Double, entropy_proxy: Double,
    thumbnail: Array[Byte])

/** Multimodal column plumbing: schema, partition-friendly batch
  * processing, decode/resize/frame-sample operators.
  *
  * The actual codec step is STUBBED — image/audio libraries are not in
  * this container — with a deterministic byte-level fake, clearly
  * marked below. Everything around it (typed binary schema, Dataset
  * encoders, mapPartitions batch shape, frame slicing, downstream
  * joins) is real and tested: swapping the stub for a JNI/pandas-based
  * decoder changes only the function body, not the pipeline shape.
  */
object MultimodalOps {

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

  /** STUB decode + feature extraction. A real deployment decodes
    * `p.data` with an image/audio codec here; this deterministic fake
    * computes byte-level statistics so the batch shape, schema, and
    * downstream logic are exercised end to end. Runs per-partition
    * (one JVM-side batch per partition — the Scala analogue of
    * mapInPandas batching). */
  def extractFeatures(media: Dataset[MediaPayload]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition setup would open the codec once here
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
        // stand-in cheap enough for a stub. The squared counts are
        // accumulated in exact integer arithmetic with ONE final
        // division, so the value is independent of summation order —
        // bit-identical across engines (oracle parity) and partitions.
        var sumSq = 0L
        var j = 0
        while (j < 256) {
          val c = counts(j).toLong
          sumSq += c * c
          j += 1
        }
        val coll = if (n == 0) 0.0 else sumSq.toDouble / (n.toDouble * n)
        // ??? real codec: decode(bytes) -> pixels -> resize(8x8)
        val thumb = bytes.take(8) // STUB thumbnail
        MediaFeatures(p.media_id, p.format, n, mean, 1.0 - coll, thumb)
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
        lower(element_at(split(col("path"), "\\."), -1)).as("format"),
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
