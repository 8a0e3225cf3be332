package graft

import org.apache.spark.sql.functions._

/** Builder-side scale ladder for the multimodal family (r15 verdict
  * "What's missing #3"): q75/q83/q84/q89/q91/q92 run on FIXED committed
  * fixtures, so their board exponents are ≈0 by construction and the
  * "media bytes never shuffle" claim was asserted from plan audits, not
  * measured on a corpus that grows. This probe generates media corpora
  * whose FILE COUNT scales (more files, same codecs — how a media corpus
  * actually grows) and times the library's own operators over them:
  *
  *   - image_features — JdkCodec decode + stats (q75's image leg)
  *   - image_dhash    — perceptual hash extraction (q83's decode stage)
  *   - audio_fp       — WAV decode + envelope fingerprint (q84)
  *   - video_scenes   — GIF frame decode → frame features → scene cuts (q89)
  *   - mp4_demux      — ISO-BMFF demux + stride sample extraction (q91)
  *   - webm_demux     — EBML demux + stride block extraction (q92)
  *
  * Per (stage, rung): min-of-reps wall, SHUFFLE BYTES per run (CpuTally
  * delta) against the corpus's total media bytes — the claim is
  * shuffle ≪ media because only feature/sample rows cross stage
  * boundaries — plus output rows. The artifact tail computes per-stage
  * wall exponents across the ladder (bar: ≈1.0; decode work is
  * per-file).
  *
  * Corpus content varies per id (hash-derived pixels/samples/frame
  * grays) so decode work is real per file; mp4/webm use the library's
  * own deterministic muxer bytes (the container walk does identical work
  * per copy — noted in the artifact).
  *
  * Usage: ProbeMediaLadder <baseDir> <n1> [n2 n3 ...]
  * (reps via SPARK_GRAFT_PROBE_REPS, default 2)
  */
object ProbeMediaLadder {

  private def mix(a: Long, b: Long): Long = {
    var z = a * 0x9e3779b97f4a7c15L + b * 0xbf58476d1ce4e5b9L + 0x94d049bb133111ebL
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 16×16 grayscale PNG, per-(id, pixel) hash pattern (the
    * ProbeMultimodal generator shape: realistic hash diversity).
    */
  private def pngBytes(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) {
        val v = ((mix(id, (y << 8) | x) >>> 56) & 0xff).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** 800-sample 16-bit mono 8 kHz RIFF/WAVE, per-id hash waveform. */
  private def wavBytes(id: Long): Array[Byte] = {
    val n = 800
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = ((mix(id, i) >>> 40) & 0xffff).toShort
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(data.length)
      .put(data)
    bb.array()
  }

  /** 8-frame 16×12 animated GIF over an identity gray palette, per-id
    * gray schedule with one large jump (a scene cut to find).
    */
  private def gifBytes(id: Long): Array[Byte] = {
    val ramp = Array.tabulate(256)(_.toByte)
    val palette = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
    val writer = writers.next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      val base = ((mix(id, 1) >>> 57) & 0x3f).toInt + 20
      val grays = (0 until 8).map(f => if (f < 4) base + f * 4 else base + 120 + f * 4)
      for (v <- grays) {
        val img = new java.awt.image.BufferedImage(16, 12,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, palette)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color(v, v, v))
        g.fillRect(0, 0, 16, 12)
        g.dispose()
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose(); ios.close()
    }
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProbeMediaLadder <baseDir> <n...>")
    val baseDir = args(0)
    val rungs = args.drop(1).map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "2").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val tally = new Bench.CpuTally
    spark.sparkContext.addSparkListener(tally)

    def r3(x: Double) = math.round(x * 1000.0) / 1000.0

    def corpus(n: Int): String = {
      val dir = s"$baseDir/n$n/media.parquet"
      if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
        val mp4 = multimodal.Mp4Demux.demoFixture()
        val webm = multimodal.WebmDemux.demoFixture()
        spark.range(n).repartition(cpus.toInt * 4).flatMap { id =>
          Seq(
            multimodal.Multimodal.MediaRow(id * 8, "image", pngBytes(id),
              16, 16, 0, 0, 0, "png"),
            multimodal.Multimodal.MediaRow(id * 8 + 1, "audio", wavBytes(id),
              0, 0, 8000, 800, 0, "wav"),
            multimodal.Multimodal.MediaRow(id * 8 + 2, "video", gifBytes(id),
              16, 12, 0, 0, 8, "gif"),
            multimodal.Multimodal.MediaRow(id * 8 + 3, "mp4", mp4,
              64, 48, 0, 0, 10, "mp4"),
            multimodal.Multimodal.MediaRow(id * 8 + 4, "webm", webm,
              64, 48, 0, 0, 7, "webm"))
        }.toDF().write.mode("overwrite").parquet(dir)
      }
      dir
    }

    case class Cell(stage: String, n: Int, wallMin: Double,
        walls: Seq[Double], shufMb: Double, rows: Long, mediaMb: Double)

    val cells = rungs.flatMap { n =>
      val dir = corpus(n)
      val mediaAll = spark.read.parquet(dir)
        .as[multimodal.Multimodal.MediaRow]
      val mediaMbByKind = spark.read.parquet(dir)
        .groupBy("kind").agg(sum(length(col("bytes"))).as("b"))
        .collect().map(r => r.getString(0) -> r.getLong(1) / 1048576.0).toMap
      def mp4Ds = mediaAll.filter(_.kind == "mp4").map(m => (m.media_id, m.bytes))
      def webmDs = mediaAll.filter(_.kind == "webm").map(m => (m.media_id, m.bytes))

      val stages: Seq[(String, String, () => Long)] = Seq(
        ("image_features", "image", () =>
          multimodal.Multimodal.imageCorpusStats(
            multimodal.Multimodal.imageFeatures(mediaAll)).collect().length.toLong),
        ("image_dhash", "image", () =>
          multimodal.Multimodal.dHashes(mediaAll)
            .agg(count(lit(1)), min("dhash"), max("dhash")).collect().length.toLong),
        ("audio_fp", "audio", () =>
          multimodal.Multimodal.audioFingerprints(mediaAll)
            .agg(count(lit(1)), min("afp"), max("afp")).collect().length.toLong),
        ("video_scenes", "video", () =>
          multimodal.Multimodal.sceneCuts(
            multimodal.Multimodal.frameFeatures(
              multimodal.Multimodal.sampleFrames(mediaAll, 2)), 60.0)
            .count()),
        ("mp4_demux", "mp4", () =>
          multimodal.Mp4Demux.demuxSamples(mp4Ds, 2, 3)
            .groupBy("kind").agg(count(lit(1)), sum("size_bytes"))
            .collect().length.toLong),
        ("webm_demux", "webm", () =>
          multimodal.WebmDemux.demuxBlocks(webmDs, 2, 3)
            .groupBy("kind").agg(count(lit(1)), sum("size_bytes"))
            .collect().length.toLong))

      stages.map { case (name, kind, run) =>
        run() // warm: plan + codegen + ImageIO plugin discovery
        val measured = (1 to reps).map { _ =>
          tally.settled()
          val shuf0 = tally.shuffleSpill()._1
          val t0 = System.nanoTime()
          val rows = run()
          val wall = (System.nanoTime() - t0) / 1e9
          tally.settled()
          val shuf = (tally.shuffleSpill()._1 - shuf0) / 1048576.0
          (wall, shuf, rows)
        }
        System.gc()
        Cell(name, n, measured.map(_._1).min, measured.map(_._1),
          measured.map(_._2).max, measured.head._3,
          mediaMbByKind.getOrElse(kind, 0.0))
      }
    }

    // r16 ADVICE: with a single rung log(1)/log(1) = NaN, and a rounded
    // NaN prints as 0.0 — which reads as FLAT scaling. One rung has no
    // exponent; emit null so the artifact can't overclaim.
    val exps = cells.groupBy(_.stage).map { case (st, cs) =>
      val s = cs.sortBy(_.n)
      val e =
        if (s.size < 2 || s.last.n == s.head.n) None
        else Some(r3(math.log(s.last.wallMin / s.head.wallMin) /
          math.log(s.last.n.toDouble / s.head.n)))
      st -> e
    }
    val cellsJson = cells.map { c =>
      s"""{"stage":"${c.stage}","n_files":${c.n},""" +
        s""""wall_reps":[${c.walls.map(r3).mkString(",")}],""" +
        s""""wall_min":${r3(c.wallMin)},"shuffle_mb_max":${r3(c.shufMb)},""" +
        s""""media_mb":${r3(c.mediaMb)},"out_rows":${c.rows}}"""
    }
    println(s"""{"probe":"media_ladder","reps":$reps,"statistic":"min_of_reps",""" +
      s""""note":"file-count ladder, per-id varied content (mp4/webm replicate the deterministic muxer fixture: identical per-copy container work). shuffle_mb_max vs media_mb is the media-bytes-never-shuffle measurement.",""" +
      s""""wall_exponents":{${exps.map { case (k, v) =>
        s""""$k":${v.map(_.toString).getOrElse("null")}""" }.mkString(",")}},""" +
      s""""cells":[${cellsJson.mkString(",")}]}""")
    spark.stop()
  }
}
