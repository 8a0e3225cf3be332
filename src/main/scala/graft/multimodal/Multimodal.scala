package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a large-scale training-data pipeline: image/audio/
  * video as opaque `binary` columns with typed metadata, plus the decode /
  * feature-extract / resize / frame-sample operators over them.
  *
  * Decode is REAL for every format the JDK ships a codec for — PNG/JPEG/
  * BMP/GIF via `javax.imageio` (including MULTI-FRAME animated GIF for the
  * video path: `JdkCodec.gifLumaFrames` composites frames sequentially per
  * the GIF disposal model), WAV/AU/AIFF via `javax.sound.sampled` — see
  * `JdkCodec`. Formats the JDK cannot decode (mp4/webm video, synthetic
  * fixtures) fall back to `StubCodec`, a deterministic pure function of the
  * bytes, so the operator plumbing stays testable where a real codec would
  * need ffmpeg (the one remaining environment seam).
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

  /** Real JDK-native decode — no dependencies beyond the JDK itself.
    *
    * Images (`javax.imageio`: PNG/JPEG/BMP/GIF): statistics over the
    * Rec.601 luma plane — mean intensity, intensity stddev (population),
    * and an edge score = mean absolute horizontal+vertical neighbor
    * gradient normalized to [0,1].
    *
    * Audio (`javax.sound.sampled`: WAV/AU/AIFF): the stream is converted
    * to signed 16-bit PCM, channel 0 is normalized to [-1,1), and the
    * features are RMS amplitude and zero-crossing rate (sign flips per
    * sample step).
    */
  object JdkCodec {
    val imageFormats: Set[String] = Set("png", "jpg", "jpeg", "bmp", "gif")
    val audioFormats: Set[String] = Set("wav", "au", "aiff")

    private def decode(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "undecodable image bytes")
      img
    }

    /** (mean intensity 0-255, intensity stddev, edge score 0-1). */
    def imageStats(bytes: Array[Byte]): (Double, Double, Double) = {
      val img = decode(bytes)
      val w = img.getWidth
      val h = img.getHeight
      val luma = new Array[Double](w * h)
      var sum = 0.0
      var sumSq = 0.0
      var y = 0
      while (y < h) {
        val row = img.getRGB(0, y, w, 1, null, 0, w)
        var x = 0
        while (x < w) {
          val p = row(x)
          val l = 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
            0.114 * (p & 0xff)
          luma(y * w + x) = l
          sum += l
          sumSq += l * l
          x += 1
        }
        y += 1
      }
      val n = (w * h).toDouble
      val mean = sum / n
      val variance = math.max(0.0, sumSq / n - mean * mean)
      var grad = 0.0
      var pairs = 0L
      y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = luma(y * w + x)
          if (x + 1 < w) { grad += math.abs(luma(y * w + x + 1) - v); pairs += 1 }
          if (y + 1 < h) { grad += math.abs(luma((y + 1) * w + x) - v); pairs += 1 }
          x += 1
        }
        y += 1
      }
      val edge = if (pairs == 0) 0.0 else grad / pairs / 255.0
      (mean, math.sqrt(variance), edge)
    }

    /** Decoded (width, height) — the pixel truth, vs the metadata claim. */
    def imageSize(bytes: Array[Byte]): (Int, Int) = {
      val img = decode(bytes)
      (img.getWidth, img.getHeight)
    }

    /** 64-bit difference hash (dHash — the standard perceptual image
      * fingerprint: Krawetz's 9x8 gradient hash). The luma plane is
      * sampled onto a 9x8 grid with EXPLICIT clamped bilinear
      * interpolation (not Java2D `drawImage`, whose downscale kernel is
      * pipeline-defined — the grid here is fully specified by this code,
      * and a 9x8 input maps onto itself exactly); each grid sample is
      * rounded to the nearest integer (canonical dHash compares 0-255
      * luma — and without it, interpolating between EQUAL doubles with
      * different weights drifts by 1 ulp and flips strict-< bits on
      * flat regions); bit (y*8 + x), packed
      * MSB-first, is set iff grid(y,x) < grid(y,x+1). Near-duplicate
      * images at any resolution land within a small Hamming distance —
      * the multimodal analog of q44's text SimHash, and the same 64-bit
      * shape, so q63/q77's banded Hamming pair machinery applies
      * unchanged at corpus scale.
      */
    def dHash64(bytes: Array[Byte]): Long = {
      val img = decode(bytes)
      val w = img.getWidth
      val h = img.getHeight
      val luma = new Array[Double](w * h)
      var y = 0
      while (y < h) {
        val row = img.getRGB(0, y, w, 1, null, 0, w)
        var x = 0
        while (x < w) {
          val p = row(x)
          luma(y * w + x) = 0.299 * ((p >> 16) & 0xff) +
            0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
          x += 1
        }
        y += 1
      }
      def cl(v: Int, n: Int): Int = math.min(n - 1, math.max(0, v))
      def at(xs: Double, ys: Double): Double = {
        val x0 = math.floor(xs).toInt
        val y0 = math.floor(ys).toInt
        val fx = xs - x0
        val fy = ys - y0
        val xa = cl(x0, w); val xb = cl(x0 + 1, w)
        val ya = cl(y0, h); val yb = cl(y0 + 1, h)
        (1 - fy) * ((1 - fx) * luma(ya * w + xa) + fx * luma(ya * w + xb)) +
          fy * ((1 - fx) * luma(yb * w + xa) + fx * luma(yb * w + xb))
      }
      var hash = 0L
      var gy = 0
      while (gy < 8) {
        val ys = (gy + 0.5) * h / 8.0 - 0.5
        var gx = 0
        while (gx < 8) {
          val a = math.rint(at((gx + 0.5) * w / 9.0 - 0.5, ys))
          val b = math.rint(at((gx + 1.5) * w / 9.0 - 0.5, ys))
          if (a < b) hash |= 1L << (63 - (gy * 8 + gx))
          gx += 1
        }
        gy += 1
      }
      hash
    }

    /** Bilinear resize, re-encoded as PNG. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val src = decode(bytes)
      val dst = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, w, h, null)
      } finally g.dispose()
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", out)
      out.toByteArray
    }

    /** Channel 0 as normalized [-1,1) doubles (signed 16-bit PCM
      * conversion, any container the JDK reads).
      */
    private def pcmChannel0(bytes: Array[Byte]): Array[Double] = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val base = in.getFormat
        val fmt = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          base.getSampleRate, 16, base.getChannels,
          base.getChannels * 2, base.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(fmt, in)
        val data = pcm.readAllBytes()
        val stride = 2 * fmt.getChannels
        val n = data.length / stride
        require(n > 0, "empty audio stream")
        val out = new Array[Double](n)
        var i = 0
        while (i < n) {
          val off = i * stride // channel 0 of an interleaved frame
          out(i) = (((data(off + 1) & 0xff) << 8) | (data(off) & 0xff)).toShort
            .toDouble / 32768.0
          i += 1
        }
        out
      } finally in.close()
    }

    /** (RMS of channel 0 in [-1,1) units, zero-crossing rate in [0,1]). */
    def audioStats(bytes: Array[Byte]): (Double, Double) = {
      val s = pcmChannel0(bytes)
      val n = s.length
      var sumSq = 0.0
      var crossings = 0L
      var prevNeg = false
      var i = 0
      while (i < n) {
        sumSq += s(i) * s(i)
        val neg = s(i) < 0
        if (i > 0 && neg != prevNeg) crossings += 1
        prevNeg = neg
        i += 1
      }
      (math.sqrt(sumSq / n),
        if (n > 1) crossings.toDouble / (n - 1) else 0.0)
    }

    /** 64-bit audio fingerprint: the energy-delta hash (the sign-of-
      * band-energy-difference shape of Haitsma & Kalker's robust audio
      * fingerprint, collapsed to one full-band energy per frame). The
      * signal is split into 65 contiguous frames (frame i covers samples
      * [i*n/65, (i+1)*n/65), integer division — any length maps onto the
      * same grid); bit i, packed MSB-first, is set iff mean energy rises
      * strictly from frame i to frame i+1. Constant-envelope signals hash
      * to 0; monotone-envelope signals to all-ones, at ANY sample count —
      * the perceptual property, mirroring dHash64's cross-resolution
      * invariance. 64-bit, so q63/q77's banded Hamming pair machinery is
      * the corpus-scale near-dup path.
      */
    def audioFingerprint64(bytes: Array[Byte]): Long = {
      val s = pcmChannel0(bytes)
      val n = s.length
      require(n >= 65, s"audio fingerprint needs >= 65 samples, got $n")
      val energy = new Array[Double](65)
      var f = 0
      while (f < 65) {
        val lo = f * n / 65
        val hi = (f + 1) * n / 65
        var sum = 0.0
        var i = lo
        while (i < hi) { sum += s(i) * s(i); i += 1 }
        energy(f) = sum / math.max(1, hi - lo)
        f += 1
      }
      var hash = 0L
      var b = 0
      while (b < 64) {
        if (energy(b) < energy(b + 1)) hash |= 1L << (63 - b)
        b += 1
      }
      hash
    }

    /** Video formats with a REAL multi-frame JDK decode path. Animated GIF
      * is the one container `javax.imageio` can step through frame by
      * frame — which makes it the honest no-native-dependency video rung:
      * every frame operator downstream (sampling, features, scene cuts)
      * runs on genuinely decoded pixels. Other containers (mp4, webm)
      * still fall to StubCodec until an ffmpeg seam exists.
      */
    val videoFormats: Set[String] = Set("gif")

    /** Sequentially decode an animated GIF, compositing frames per the GIF
      * disposal model, and emit every `stride`-th COMPOSITED frame as
      * (frame_idx, width, height, Rec.601 luma plane, row-major bytes) —
      * the payload shape `frameFeatures` consumes (its byte-mean over a
      * luma plane IS mean intensity).
      *
      * Disposal handling (GIF89a GraphicControlExtension), r13 ADVICE:
      *   - none / doNotDispose: the frame stays on the canvas.
      *   - restoreToBackgroundColor: the frame's rect is filled with the
      *     stream's declared background color (backgroundColorIndex into
      *     the global color table) before the next frame draws; black when
      *     the stream declares none. A transparent background composites
      *     as that same fill — the luma plane has no alpha to carry, so
      *     the declared background IS the honest concrete value.
      *   - restoreToPrevious: the canvas region the frame covers is
      *     snapshotted before the frame draws and put back before the
      *     next frame draws. Bounded memory: at most ONE rect snapshot is
      *     alive at a time, and only when this mode is actually used.
      *   - reserved values (4-7, "undefinedDisposalMethod*"): treated as
      *     doNotDispose — the GIF89a spec reserves them and mainstream
      *     decoders composite them as do-not-dispose; rejecting would
      *     fail real corpus files over a bit the spec itself ignores.
      *
      * GIF is a delta codec: frame i is only defined given frames 0..i-1,
      * so the decode is one sequential pass holding a single canvas —
      * bounded memory however long the animation — materializing ONLY the
      * sampled frames. This runs inside the per-partition decode stage;
      * frames shuffle nowhere.
      */
    def gifLumaFrames(bytes: Array[Byte], stride: Int): Seq[(Int, Int, Int, Array[Byte])] = {
      require(stride >= 1, s"stride must be >= 1, got $stride")
      val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
      require(readers.hasNext, "JDK has no GIF reader")
      val reader = readers.next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        require(n > 0, "GIF stream holds no frames")
        def elem(root: org.w3c.dom.Node, tag: String): Option[org.w3c.dom.Element] = {
          val nl = root.asInstanceOf[org.w3c.dom.Element].getElementsByTagName(tag)
          if (nl.getLength > 0) Some(nl.item(0).asInstanceOf[org.w3c.dom.Element])
          else None
        }
        val streamRoot = Option(reader.getStreamMetadata)
          .map(_.getAsTree("javax_imageio_gif_stream_1.0"))
        // logical screen from stream metadata; fall back to frame 0's size
        val (lsw, lsh) = streamRoot
          .flatMap(elem(_, "LogicalScreenDescriptor"))
          .map(e => (e.getAttribute("logicalScreenWidth").toInt,
            e.getAttribute("logicalScreenHeight").toInt))
          .getOrElse {
            val f0 = reader.read(0); (f0.getWidth, f0.getHeight)
          }
        // declared background color: backgroundColorIndex into the global
        // color table (both live on the GlobalColorTable metadata element)
        val bgColor = streamRoot.flatMap(elem(_, "GlobalColorTable"))
          .flatMap { gct =>
            val idx = gct.getAttribute("backgroundColorIndex")
            if (idx == null || idx.isEmpty) None
            else {
              val entries = gct.getElementsByTagName("ColorTableEntry")
              (0 until entries.getLength)
                .map(entries.item(_).asInstanceOf[org.w3c.dom.Element])
                .find(_.getAttribute("index") == idx)
                .map(e => new java.awt.Color(e.getAttribute("red").toInt,
                  e.getAttribute("green").toInt, e.getAttribute("blue").toInt))
            }
          }
          .getOrElse(java.awt.Color.BLACK)
        val canvas = new java.awt.image.BufferedImage(lsw, lsh,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = canvas.createGraphics()
        try {
          val out = Seq.newBuilder[(Int, Int, Int, Array[Byte])]
          // frame rects clamped to the canvas (a malformed descriptor may
          // overhang; getRGB/setRGB throw out of bounds, drawImage clips)
          def clamp(x: Int, y: Int, w: Int, h: Int): (Int, Int, Int, Int) = {
            val cx = math.max(0, math.min(x, lsw))
            val cy = math.max(0, math.min(y, lsh))
            (cx, cy, math.max(0, math.min(x + w, lsw) - cx),
              math.max(0, math.min(y + h, lsh) - cy))
          }
          var prevDisposal = "none"
          var prevRect = (0, 0, 0, 0)
          var prevSnapshot: Array[Int] = null
          var i = 0
          while (i < n) {
            val frame = reader.read(i)
            val md = reader.getImageMetadata(i).getAsTree("javax_imageio_gif_image_1.0")
            val (x, y) = elem(md, "ImageDescriptor").map(e =>
              (e.getAttribute("imageLeftPosition").toInt,
                e.getAttribute("imageTopPosition").toInt)).getOrElse((0, 0))
            // frame i-1's disposal applies BEFORE frame i draws
            prevDisposal match {
              case "restoreToBackgroundColor" =>
                g.setColor(bgColor)
                g.fillRect(prevRect._1, prevRect._2, prevRect._3, prevRect._4)
              case "restoreToPrevious" if prevSnapshot != null =>
                canvas.setRGB(prevRect._1, prevRect._2, prevRect._3,
                  prevRect._4, prevSnapshot, 0, prevRect._3)
              case _ => () // none / doNotDispose / reserved 4-7
            }
            val disposal = elem(md, "GraphicControlExtension")
              .map(_.getAttribute("disposalMethod")).getOrElse("none")
            val rect = clamp(x, y, frame.getWidth, frame.getHeight)
            val snapshot =
              if (disposal == "restoreToPrevious" && rect._3 > 0 && rect._4 > 0)
                canvas.getRGB(rect._1, rect._2, rect._3, rect._4,
                  null, 0, rect._3)
              else null
            g.drawImage(frame, x, y, null)
            if (i % stride == 0) {
              val luma = new Array[Byte](lsw * lsh)
              var yy = 0
              while (yy < lsh) {
                val row = canvas.getRGB(0, yy, lsw, 1, null, 0, lsw)
                var xx = 0
                while (xx < lsw) {
                  val p = row(xx)
                  val l = 0.299 * ((p >> 16) & 0xff) +
                    0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
                  luma(yy * lsw + xx) = math.min(255L, math.round(l)).toByte
                  xx += 1
                }
                yy += 1
              }
              out += ((i, lsw, lsh, luma))
            }
            prevDisposal = disposal
            prevRect = rect
            prevSnapshot = snapshot
            i += 1
          }
          out.result()
        } finally g.dispose()
      } finally {
        reader.dispose()
        iis.close()
      }
    }
  }

  /** Deterministic stand-in for formats the JDK has no codec for (video;
    * synthetic fixtures). Everything it returns is a pure function of
    * (bytes, params) via a rolling 64-bit hash, so operator tests are
    * exact. A real video path (ffmpeg via JNI or a Python mapInPandas
    * stage) swaps in here; nothing else changes.
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

    /** Deterministic stand-in perceptual hash for codec-less formats. */
    def dHash64(bytes: Array[Byte]): Long = h64(bytes, 6)

    /** Deterministic stand-in audio fingerprint for codec-less formats. */
    def audioFingerprint64(bytes: Array[Byte]): Long = h64(bytes, 7)
  }

  /** Image decode + feature extraction: one codec "session" per partition,
    * rows streamed through it (the mapInPandas batch shape, in Scala).
    * JDK-decodable formats report the DECODED dimensions (pixel truth);
    * stub formats echo the metadata claim.
    */
  def imageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      // ImageIO plugin discovery happens once per JVM; per-partition the
      // codec is stateless — rows stream straight through it
      rows.map { m =>
        if (JdkCodec.imageFormats(m.format)) {
          val (mean, std, edge) = JdkCodec.imageStats(m.bytes)
          val (w, h) = JdkCodec.imageSize(m.bytes)
          ImageFeatures(m.media_id, w, h, mean, std, edge)
        } else {
          val (mean, std, edge) = StubCodec.imageStats(m.bytes)
          ImageFeatures(m.media_id, m.width, m.height, mean, std, edge)
        }
      }
    }
  }

  /** Audio decode + features; duration derives from typed metadata (the
    * byte payload may be truncated or resampled — metadata is the claim
    * the pipeline tracks).
    */
  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "audio").mapPartitions { rows =>
      rows.map { m =>
        val (rms, zcr) =
          if (JdkCodec.audioFormats(m.format)) JdkCodec.audioStats(m.bytes)
          else StubCodec.audioStats(m.bytes)
        val dur = if (m.sample_rate > 0) m.n_samples.toDouble / m.sample_rate else 0.0
        AudioFeatures(m.media_id, m.sample_rate, dur, rms, zcr)
      }
    }
  }

  /** Resize plumbing: bytes and metadata move together; output metadata is
    * the target size. JDK formats re-encode as PNG (bilinear).
    */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      rows.map { m =>
        if (JdkCodec.imageFormats(m.format))
          m.copy(bytes = JdkCodec.resize(m.bytes, w, h),
            width = w, height = h, format = "png")
        else
          m.copy(bytes = StubCodec.resize(m.bytes, w, h),
            width = w, height = h)
      }
    }
  }

  /** Frame sampling: every `stride`-th frame — emits ONLY the sampled
    * frames, so a 100k-frame video with stride 1000 produces 100 rows, not
    * 100k. GIF rows decode for REAL (JdkCodec.gifLumaFrames: sequential
    * composite, luma-plane payload, dimensions and frame count from the
    * actual stream — pixel truth, not the metadata claim); codec-less
    * formats keep the deterministic stub payloads sized from typed
    * metadata.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      if (JdkCodec.videoFormats(m.format))
        JdkCodec.gifLumaFrames(m.bytes, stride).map { case (idx, w, h, luma) =>
          Frame(m.media_id, idx, w, h, luma)
        }
      else
        (0 until m.n_frames by stride).map { idx =>
          Frame(m.media_id, idx, m.width, m.height,
            StubCodec.frame(m.bytes, idx, m.width, m.height))
        }
    }
  }

  /** Per-frame scalar features for the sampled frames: (media_id,
    * frame_idx, mean_intensity in [0,255]). The byte payload collapses to
    * one double INSIDE this narrow stage — downstream temporal analytics
    * (scene cuts, motion energy) shuffle 20-byte rows, never frames. No
    * higher-order Catalyst function iterates BinaryType, so the byte loop
    * is the mapPartitions carve-out, same as the decoders above.
    */
  def frameFeatures(frames: Dataset[Frame]): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.mapPartitions { rows =>
      rows.map { f =>
        var s = 0L
        var i = 0
        while (i < f.frame_bytes.length) {
          s += (f.frame_bytes(i) & 0xff)
          i += 1
        }
        (f.media_id, f.frame_idx,
          if (f.frame_bytes.isEmpty) 0.0 else s.toDouble / f.frame_bytes.length)
      }
    }.toDF("media_id", "frame_idx", "mean_intensity")
  }

  /** Scene-cut detection over frame features: a cut at frame i when the
    * intensity jump from the PREVIOUS SAMPLED frame exceeds `threshold`.
    * Pure relational temporal pass — one keyed window (partition-local
    * sort per media, no global sort), the same W1/W5 shape as the tick
    * analytics; the first sampled frame of each video has no predecessor
    * and is never a cut. Output: (media_id, frame_idx, delta, is_cut).
    *
    * Reference scope: the recording UI's asset panel marks visual
    * discontinuities in capture playback (src/recording_ui/services/
    * assets.py thumbnails timeline); this is that marker as a corpus-scale
    * operator over the frame-sample path.
    */
  def sceneCuts(frameFeatures: DataFrame, threshold: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    frameFeatures
      .withColumn("delta", col("mean_intensity") - lag(col("mean_intensity"), 1).over(w))
      .withColumn("is_cut", coalesce(abs(col("delta")) > lit(threshold), lit(false)))
      .select("media_id", "frame_idx", "delta", "is_cut")
  }

  /** Perceptual hashes for the image rows: (media_id, dhash). At corpus
    * scale the BYTES stay in this narrow stage — only 16-byte hash rows
    * ever shuffle, and the pair generation downstream is the q63/q77
    * banded-Hamming shape (dhash is bit-compatible with simhash64's
    * 64-bit signature space). Stub formats hash deterministically so the
    * plumbing is testable without a codec.
    */
  def dHashes(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      rows.map { m =>
        val h =
          if (JdkCodec.imageFormats(m.format)) JdkCodec.dHash64(m.bytes)
          else StubCodec.dHash64(m.bytes)
        (m.media_id, h)
      }
    }.toDF("media_id", "dhash")
  }

  /** Audio fingerprints for the audio rows: (media_id, afp) — the audio
    * leg of the perceptual-dedup family, same narrow-stage shape as
    * dHashes (bytes never shuffle).
    */
  def audioFingerprints(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "audio").mapPartitions { rows =>
      rows.map { m =>
        val h =
          if (JdkCodec.audioFormats(m.format)) JdkCodec.audioFingerprint64(m.bytes)
          else StubCodec.audioFingerprint64(m.bytes)
        (m.media_id, h)
      }
    }.toDF("media_id", "afp")
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
