package graft

import org.apache.spark.sql.functions._

/** Builder-side scale probe for q74's PRODUCTION k schedule (r14 verdict
  * item #5): the demo query derives k = √N (oracle-pinned), so 100× data
  * means 10× clusters of 10× the size and the within-cluster pair work
  * grows ~N^1.5 — the board's disclosed super-linearity. The production
  * answer SemDeDup-style pipelines actually run is k ∝ N: cluster count
  * grows with the corpus and the MEAN CLUSTER SIZE stays pinned at the
  * base corpus's (~√N₀ ≈ 45 vectors here), so Σ|cluster|² — the candidate
  * pair volume — grows linearly and the pair stage flattens.
  *
  * This probe runs the UNCHANGED q74 plan (same Lloyd fit, same triangle
  * grid, same cosine bar) at both schedules on the replica ladder and
  * reports the k used, candidate/kept pair counts, and min-of-reps noop
  * walls, so the k-schedule claim carries measured numbers. The demo
  * oracle stays k = √N; nothing here changes query semantics.
  *
  * Usage: ProbeQ74K <baseDir> <dir10x> <dir100x> [reps=2]
  * Emits one JSON line (BENCH_r15_q74k_probe.json).
  */
object ProbeQ74K {

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ProbeQ74K <baseDir> <dir10x> <dir100x> [reps]")
    val baseDir = args(0)
    val dirs = Seq("10x" -> args(1), "100x" -> args(2))
    val reps = args.lift(3).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nBase = Tables.rowCount(spark, baseDir, "embeddings")
    val kBase = similarity.SimilarityQueries.kmK(nBase)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def r3(x: Double) = math.round(x * 1000.0) / 1000.0

    val legs = for {
      (label, dir) <- dirs
      schedule <- Seq("sqrtN", "propN")
    } yield {
      val n = Tables.rowCount(spark, dir, "embeddings")
      // propN: k grows with the corpus so mean cluster size stays at the
      // base corpus's N₀/k₀ — the SemDeDup production sizing
      val k = schedule match {
        case "sqrtN" => None // the query's own kmK(n)
        case _ => Some(math.max(kBase,
          math.round(n.toDouble / nBase * kBase).toInt))
      }
      val kUsed = k.getOrElse(similarity.SimilarityQueries.kmK(n))
      val candPairs = similarity.SimilarityQueries
        .semCandidatePairs(spark, dir, k).count()
      val kept = similarity.SimilarityQueries
        .semanticDedup(spark, dir, k)
        .filter(col("kept")).count()
      def runOnce(): Unit = similarity.SimilarityQueries
        .semanticDedup(spark, dir, k)
        .write.format("noop").mode("overwrite").save()
      runOnce() // warm (plan + codegen)
      val walls = (1 to reps).map(_ => time(runOnce()))
      System.gc()
      s"""{"sf":"$label","schedule":"$schedule","n":$n,"k":$kUsed,""" +
        s""""mean_cluster":${r3(n.toDouble / kUsed)},""" +
        s""""candidate_pairs":$candPairs,"kept_rows":$kept,""" +
        s""""wall_reps":[${walls.map(r3).mkString(",")}],""" +
        s""""wall_min":${r3(walls.min)}}"""
    }
    println(s"""{"probe":"q74_production_k","base_n":$nBase,""" +
      s""""base_k":$kBase,"reps":$reps,""" +
      s""""note":"sqrtN = the oracle-pinned demo schedule; propN = production k ∝ N (mean cluster pinned at base)",""" +
      s""""legs":[${legs.mkString(",")}]}""")
    spark.stop()
  }
}
