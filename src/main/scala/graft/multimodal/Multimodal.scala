package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a large-scale training-data pipeline: image/audio/
  * video as opaque `binary` columns with typed metadata, plus the decode /
  * feature-extract / resize / frame-sample operators over them.
  *
  * The Spark-side plumbing — schema, partitioning, per-partition batch
  * iteration, operator signatures — is real and tested. The codec step
  * itself is STUBBED behind `StubCodec` (this environment has no image/audio
  * libraries): it produces deterministic bytes/features derived from the
  * input, so tests are exact and the stub swaps for a real codec (JNI/
  * javacpp-ffmpeg or a Python mapInPandas stage) without touching any
  * operator shape.
  *
  * Scale design:
  *   - media bytes NEVER go through a shuffle in these operators: decode and
  *     feature extraction are narrow `mapPartitions` over the scan, and
  *     aggregations happen on the (tiny) extracted features, not the bytes;
  *   - per-partition iteration is the Scala analog of `mapInPandas` batch
  *     shape: one codec init per partition (not per row), streaming rows
  *     through it;
  *   - frame sampling explodes to (media_id, frame_idx) rows only for the
  *     sampled frames — never one row per source frame.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      width: Int, height: Int,          // image/video
      sample_rate: Int, n_samples: Int, // audio
      n_frames: Int,                    // video
      format: String)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  final case class ImageFeatures(
      media_id: Long, width: Int, height: Int,
      mean_intensity: Double, intensity_std: Double, edge_score: Double)

  final case class AudioFeatures(
      media_id: Long, sample_rate: Int, duration_s: Double,
      rms: Double, zero_crossing_rate: Double)

  final case class Frame(
      media_id: Long, frame_idx: Int, width: Int, height: Int,
      frame_bytes: Array[Byte])

  /** Deterministic stand-in for the real codecs. Everything it returns is a
    * pure function of (bytes, params) via a rolling 64-bit hash, so operator
    * tests are exact. Swap this object for a real decoder implementation;
    * nothing else changes.
    */
  object StubCodec {
    private def h64(bytes: Array[Byte], seed: Long): Long = {
      var h = seed ^ 0x9e3779b97f4a7c15L
      var i = 0
      while (i < bytes.length) {
        h = (h ^ bytes(i)) * 0x100000001b3L
        i += 1
      }
      h
    }
    private def unit(x: Long): Double = // [0,1) from a hash
      (x >>> 11).toDouble / (1L << 53).toDouble

    def imageStats(bytes: Array[Byte]): (Double, Double, Double) =
      (unit(h64(bytes, 1)) * 255.0, unit(h64(bytes, 2)) * 64.0, unit(h64(bytes, 3)))

    def audioStats(bytes: Array[Byte]): (Double, Double) =
      (unit(h64(bytes, 4)), unit(h64(bytes, 5)))

    /** "Resize": deterministic re-encode of (bytes, w, h) into w*h/64 bytes. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val n = math.max(1, w * h / 64)
      val out = new Array[Byte](n)
      var x = h64(bytes, w.toLong << 32 | h.toLong)
      var i = 0
      while (i < n) {
        x = x * 6364136223846793005L + 1442695040888963407L
        out(i) = (x >>> 56).toByte
        i += 1
      }
      out
    }

    /** "Decode one frame": deterministic bytes for (bytes, frameIdx). */
    def frame(bytes: Array[Byte], frameIdx: Int, w: Int, h: Int): Array[Byte] =
      resize(bytes ++ Array(frameIdx.toByte), w, h)
  }

  /** Image decode + feature extraction: one codec "session" per partition,
    * rows streamed through it (the mapInPandas batch shape, in Scala).
    */
  def imageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      // real impl: init decoder once per partition here
      rows.map { m =>
        val (mean, std, edge) = StubCodec.imageStats(m.bytes)
        ImageFeatures(m.media_id, m.width, m.height, mean, std, edge)
      }
    }
  }

  /** Audio decode + features; duration derives from typed metadata, not the
    * stub — metadata math is real.
    */
  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "audio").mapPartitions { rows =>
      rows.map { m =>
        val (rms, zcr) = StubCodec.audioStats(m.bytes)
        val dur = if (m.sample_rate > 0) m.n_samples.toDouble / m.sample_rate else 0.0
        AudioFeatures(m.media_id, m.sample_rate, dur, rms, zcr)
      }
    }
  }

  /** Resize plumbing: bytes and metadata move together; output metadata is
    * the target size.
    */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      rows.map(m => m.copy(bytes = StubCodec.resize(m.bytes, w, h),
        width = w, height = h))
    }
  }

  /** Frame sampling: every `stride`-th frame index from the video's typed
    * n_frames — emits ONLY the sampled frames, so a 100k-frame video with
    * stride 1000 produces 100 rows, not 100k.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      (0 until m.n_frames by stride).map { idx =>
        Frame(m.media_id, idx, m.width, m.height,
          StubCodec.frame(m.bytes, idx, m.width, m.height))
      }
    }
  }

  /** Corpus rollup over extracted features (bytes are long gone by here —
    * only the small feature rows shuffle).
    */
  def imageCorpusStats(feats: Dataset[ImageFeatures]): DataFrame =
    feats.toDF().agg(
      count(lit(1)).as("n_images"),
      avg("mean_intensity").as("avg_intensity"),
      avg("edge_score").as("avg_edge_score"),
      max("width").as("max_width"),
      max("height").as("max_height"))
}
