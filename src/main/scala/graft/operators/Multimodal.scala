package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decode/feature-extract as partition-wise
  * batch transforms.
  *
  * The decode kernels are STUBBED (no image/audio libraries ship in this
  * container) with deterministic fakes; everything Spark-side — schema,
  * typed Dataset shape, mapPartitions batching, partitioning — is real.
  * In production the `decodeStub`/`featuresStub` bodies are replaced by
  * JNI/FFM calls into the codec library; the operator shape (one
  * iterator-to-iterator pass per partition, no driver involvement, no
  * shuffle) is exactly what runs at 100 TB.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  case class MediaRecord(
      media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, format: String, duration_ms: Long)

  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      feature: Array[Float], frame_count: Int)

  /** Real ingestion path for media directories: Spark's binaryFile
    * source yields (path, modificationTime, length, content) with
    * content as the opaque payload — the at-scale entry point for
    * image/audio/video directories (supports pathGlobFilter, recursive
    * lookup, and partition pruning on path). */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        xxhash64(col("path")).as("media_id"),
        col("path"),
        col("content").as("bytes"),
        col("length").cast(LongType).as("n_bytes"))

  /** Synthesize a media table from the documents corpus: payload = UTF-8
    * bytes of the text (deterministic), metadata derived from doc fields.
    * Stands in for `spark.read.format("binaryFile")` at scale. */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
      col("text").cast(BinaryType).as("bytes"),
      (col("n_chars") % 640 + 32).cast(IntegerType).as("width"),
      (col("n_chars") % 480 + 32).cast(IntegerType).as("height"),
      lit("raw").as("format"),
      (col("n_chars") * 10L).as("duration_ms"))

  /** STUB decode kernel: deterministic features from payload bytes.
    * Real impl would decode pixels/samples here (out of scope: codec libs
    * are not in this container). */
  private[operators] def featuresStub(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      out(i % dim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Partition-wise feature extraction: Dataset[MediaRecord] →
    * Dataset[MediaFeatures]. Iterator-to-iterator (constant memory per
    * partition), narrow (no shuffle), executor-side only. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val feats = featuresStub(m.bytes)
        val frames =
          if (m.kind == "video") math.max(1, (m.duration_ms / 1000L).toInt) else 1
        MediaFeatures(m.media_id, m.kind, m.bytes.length, feats, frames)
      }
    }
  }

  /** Resize step for image rows. The Spark-side semantics are REAL —
    * aspect-preserving fit to (maxW, maxH), never upscaling, metadata
    * updated per row, iterator-to-iterator narrow pass — only the pixel
    * resample kernel is the STUB (deterministic byte subsample scaled by
    * the area ratio; a real impl decodes and scales pixels here — codec
    * libs are not in this container). Non-image rows pass through. */
  def resizeStub(media: Dataset[MediaRecord], maxW: Int, maxH: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    require(maxW > 0 && maxH > 0, s"bad bounds: ${maxW}x$maxH")
    media.mapPartitions { it =>
      it.map { m =>
        if (m.kind != "image" || (m.width <= maxW && m.height <= maxH)) m
        else {
          val scale = math.min(maxW.toDouble / m.width, maxH.toDouble / m.height)
          val w = math.max(1, math.round(m.width * scale).toInt)
          val h = math.max(1, math.round(m.height * scale).toInt)
          // shrink-only contract: never grow the payload (incl. 0-byte case)
          val targetLen =
            math.min(m.bytes.length, math.max(1, (m.bytes.length * scale * scale).toInt))
          m.copy(bytes = java.util.Arrays.copyOf(m.bytes, targetLen),
            width = w, height = h)
        }
      }
    }
  }

  /** Audio resample step — the audio twin of [[resizeStub]]. Spark-side
    * semantics are REAL: only audio rows touched, downsample-only (a
    * higher target rate is a no-op, like resize never upscales),
    * duration preserved, payload shrunk by the rate ratio, narrow
    * iterator pass; the sample-rate-conversion kernel is the STUB
    * (deterministic byte decimation — a real impl low-pass-filters and
    * interpolates PCM here; codec libs are not in this container).
    * `fromHz` is carried per-row in `width` (synthesize leaves it as a
    * free metadata slot for non-images); the new rate lands there. */
  def resamplePcmStub(media: Dataset[MediaRecord], toHz: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    require(toHz > 0, s"bad target rate: $toHz")
    media.mapPartitions { it =>
      it.map { m =>
        val fromHz = m.width
        if (m.kind != "audio" || fromHz <= toHz) m
        else {
          val ratio = toHz.toDouble / fromHz
          val targetLen =
            math.min(m.bytes.length, math.max(1, (m.bytes.length * ratio).toInt))
          m.copy(bytes = java.util.Arrays.copyOf(m.bytes, targetLen), width = toHz)
        }
      }
    }
  }

  /** Kernel validation: [[featuresStub]] routes every payload byte into
    * exactly one feature slot, so Σ feature == Σ bytes/255 per record up
    * to float32 accumulation error. Returns (media_id, ok) — a correct
    * kernel has zero `ok = false` rows; the m01 gate counts them. The
    * check is the template for validating a REAL decode kernel too
    * (energy/checksum conservation per record, computed in the same
    * partition pass as the decode — no second data movement). */
  def featureConservation(media: Dataset[MediaRecord],
      tol: Double = 1e-2): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val f = featuresStub(m.bytes)
        var bs = 0.0
        var i = 0
        while (i < m.bytes.length) { bs += (m.bytes(i) & 0xff) / 255.0; i += 1 }
        var fs = 0.0
        var j = 0
        while (j < f.length) { fs += f(j); j += 1 }
        (m.media_id, math.abs(fs - bs) <= tol * math.max(1.0, bs))
      }
    }.toDF("media_id", "ok")
  }

  /** Frame sampling for video rows: one output row per sampled frame
    * offset (sequence + explode — pure expressions, no UDF). */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("duration_ms"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))).as("frame_off_ms"))

  /** End-to-end stub pipeline over a documents frame. */
  def featurePipeline(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val media = synthesize(docs).as[MediaRecord]
    extractFeatures(media).toDF()
  }
}
