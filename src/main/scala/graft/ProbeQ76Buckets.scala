package graft

import org.apache.spark.sql.functions._

/** Builder-side diagnosis probe for the q76 100× disk death (r14): the
  * RH-band bucket-size distribution on a replica corpus, plus the grid
  * shuffle volume each chunkSize implies. Emits one JSON line; feeds the
  * SCALING.md q76 note and the fix choice (no artifact of its own —
  * numbers land in BENCH_r14_100x_board.json's narrative).
  *
  * Usage: ProbeQ76Buckets <sfDir>
  */
object ProbeQ76Buckets {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, d)
    val n = Tables.rowCount(spark, d, "embeddings")
    val bandBits = math.min(15, math.max(8,
      math.ceil(math.log(math.max(n / 8.0, 2.0)) / math.log(2.0)).toInt))
    val numPlanes = 4 * bandBits
    val mask = (1L << bandBits) - 1
    val signed = emb.select(col("vec_id"),
      graft.functions.RandomHyperplaneSignature
        .rh_signature(spark, "embedding", numPlanes).as("sig"))
    val banded = signed.select(col("vec_id"),
      posexplode(array((0 until 4).map { b =>
        shiftright(col("sig"), b * bandBits).bitwiseAND(lit(mask))
      }: _*)).as(Seq("band", "bkey")))
    val sizes = banded.groupBy("band", "bkey").count()
      .select(col("count")).as[Long](spark.implicits.newLongEncoder)
      .collect().sorted.reverse
    val top = sizes.take(10).mkString("[", ",", "]")
    val pairs = sizes.map(k => k * (k - 1) / 2).sum
    def gridGB(chunk: Int): Double = {
      val bytes = sizes.filter(_ > chunk).map { k =>
        val nchunks = math.ceil(k.toDouble / chunk)
        2.0 * k * (nchunks / 2.0) * 560.0 // both sides, ~560B/row with vec
      }.sum
      math.round(bytes / 1e9 * 10) / 10.0
    }
    println(s"""{"probe":"q76_buckets","dir":"$d","n_vectors":$n,""" +
      s""""band_bits":$bandBits,"n_buckets":${sizes.length},""" +
      s""""top10_bucket_sizes":$top,"true_pairs":$pairs,""" +
      s""""grid_gb_chunk256":${gridGB(256)},"grid_gb_chunk2048":${gridGB(2048)},""" +
      s""""grid_gb_chunk8192":${gridGB(8192)},"grid_gb_chunk16384":${gridGB(16384)}}""")
    spark.stop()
  }
}
