package graft

/** Builder-side scale probe for the perceptual-hash family (not part of
  * the library): generates N synthetic PNGs into a parquet media table
  * (untimed), then times (a) the decode+dHash stage and (b) q63-shape
  * banded Hamming pair generation over the hashes. Usage:
  *   ProbeMultimodal <nImages> [outDir]
  */
object ProbeMultimodal {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(100000)
    val dir = args.lift(1).getOrElse("/tmp/graft_media_probe")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._

    // 16x16 PNGs: ~n/8 pattern classes of 8 near-identical variants; the
    // variant perturbs one corner pixel by +-1 luma (far below the >=16
    // inter-sample gradient), so variants share a dHash by construction
    val gen = spark.range(n).repartition(cpus.toInt * 4).map { id =>
      val cls = id / 8
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 16) {
        var x = 0
        while (x < 16) {
          // per-(class, pixel) mixed value: classes get independent
          // random-looking patterns (realistic hash diversity — a linear
          // gradient family collapses to a handful of dHashes and the
          // probe then measures degenerate-bucket blowup instead)
          val m = cls * 0x9E3779B97F4A7C15L + x * 0xC2B2AE3D27D4EB4FL +
            y * 0x165667B19E3779F9L
          val v = ((((m ^ (m >>> 29)) * 0xBF58476D1CE4E5B9L) >>> 56) & 0xff).toInt
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val p0 = img.getRGB(15, 15) & 0xff
      val v0 = math.max(0, math.min(255, p0 + (if (id % 2 == 0) 1 else -1)))
      img.setRGB(15, 15, (v0 << 16) | (v0 << 8) | v0)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      (id, "image", out.toByteArray, 16, 16, 0, 0, 0, "png")
    }.toDF("media_id", "kind", "bytes", "width", "height",
      "sample_rate", "n_samples", "n_frames", "format")
    gen.write.mode("overwrite").parquet(dir)

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    val media = spark.read.parquet(dir).as[multimodal.Multimodal.MediaRow]
    // (a) decode + hash, the byte-bound stage. Timed via an EAGER
    // localCheckpoint — full row materialization, nothing prunable (the
    // r13 protocol rule: no timed count() in probe paths), and the
    // checkpointed result feeds the later legs without a second decode.
    val (hashSec, hashes) = time {
      multimodal.Multimodal.dHashes(media).localCheckpoint()
    }
    val nHashes = hashes.count() // untimed; reads the checkpoint
    val (dedupSec, nDistinct) = time {
      hashes.agg(count_distinct(col("dhash"))).head.getLong(0)
    }
    // (b) q63-shape banded pair generation: 4 x 16-bit bands, bucket
    // join, exact Hamming verify at the bar
    val banded = hashes.select(col("media_id"), col("dhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("dhash"), b * 16)
            .bitwiseAND(lit(0xffffL)).as("key"))): _*)).as("bk"))
      .select(col("media_id"), col("dhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val (pairSec, nPairs) = time {
      banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.media_id") < col("b.media_id"))
        .select(col("a.media_id").as("ida"), col("b.media_id").as("idb"),
          bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))).as("ham"))
        .filter(col("ham") <= 8)
        .agg(count_distinct(col("ida"), col("idb")))
        .head.getLong(0)
    }
    println(s"""{"metric":"multimodal_dhash_probe","n_images":$nHashes,""" +
      s""""hash_sec":${math.round(hashSec * 1000) / 1000.0},""" +
      s""""images_per_sec":${math.round(nHashes / hashSec)},""" +
      s""""distinct_hashes":$nDistinct,"dedup_sec":${math.round(dedupSec * 1000) / 1000.0},""" +
      s""""banded_pair_sec":${math.round(pairSec * 1000) / 1000.0},"pairs_at_bar":$nPairs}""")
    spark.stop()
  }
}
