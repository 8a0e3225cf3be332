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
  * Usage: ProbeQ74K <baseDir> <dir|synth:N:dir>... (reps via
  * SPARK_GRAFT_PROBE_REPS, default 2). Replica-ladder legs measure the
  * schedules on the near-dup-saturated corpus (where variant families
  * cap what ANY k schedule can flatten); synth legs (distinct vectors)
  * isolate the schedule's own effect. Emits one JSON line
  * (BENCH_r15_q74k_probe.json).
  */
object ProbeQ74K {

  /** `synth:N:dir` legs (the ProbeIvfPq convention): N DISTINCT
    * hash-derived vectors, so pair volume reflects the k schedule instead
    * of the replica corpus's ~100-member near-identical variant families
    * (on those, Σ|cluster|² stays family-quadratic at ANY k — the first
    * r15 run measured propN candidates at 431M vs sqrtN's 827M at 100×,
    * a 1.9× trim where a non-degenerate corpus shows the linear flatten).
    */
  private def resolveDir(spark: org.apache.spark.sql.SparkSession,
      dirArg: String): String =
    if (dirArg.startsWith("synth:")) {
      val Array(_, nStr, outDir) = dirArg.split(":", 3)
      val path = s"$outDir/embeddings.parquet"
      // _SUCCESS, not the bare directory: a crashed prior write leaves a
      // partial directory that would otherwise be silently consumed
      if (!new java.io.File(s"$path/_SUCCESS").exists()) {
        spark.range(nStr.toLong)
          .select(col("id").as("vec_id"),
            transform(sequence(lit(0), lit(63)), dIdx =>
              (pmod(xxhash64(col("id") * 64 + dIdx), lit(1000000L))
                .cast("double") / 500000.0 - 1.0).cast("float"))
              .as("embedding"))
          .write.mode("overwrite").parquet(path)
      }
      outDir
    } else dirArg

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ProbeQ74K <baseDir> <dir...|synth:N:dir...> [reps via SPARK_GRAFT_PROBE_REPS]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val baseDir = resolveDir(spark, args(0))
    val dirs = args.drop(1).toSeq.map { a =>
      val d = resolveDir(spark, a)
      val label = if (a.startsWith("synth:")) "synth:" + a.split(":")(1) else d.split("/").last
      label -> d
    }
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "2").toInt

    val nBase = Tables.rowCount(spark, baseDir, "embeddings")
    val kBase = similarity.SimilarityQueries.kmK(nBase)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def r3(x: Double) = math.round(x * 1000.0) / 1000.0

    // SPARK_GRAFT_Q74_SCHEDULES selects a subset (comma-separated) — the
    // brute propN fit is O(N·K·d) per assignment pass BY DESIGN, so upper
    // ladder rungs run it selectively (the ANN leg is what scales there)
    val schedules = sys.env.get("SPARK_GRAFT_Q74_SCHEDULES")
      .map(_.split(",").toSeq)
      .getOrElse(Seq("sqrtN", "propN", "propN_ann"))
    val legs = for {
      (label, dir) <- dirs
      schedule <- schedules
    } yield {
      val n = Tables.rowCount(spark, dir, "embeddings")
      // propN: k grows with the corpus so mean cluster size stays at the
      // base corpus's N₀/k₀ — the SemDeDup production sizing.
      // propN_ann (r16): same k schedule, but every Lloyd assignment pass
      // is ANN-assisted (IvfArgminL2, nprobe=8) — the production answer
      // to the O(N·K) brute assign leg this probe exposed in r15.
      val k = schedule match {
        case "sqrtN" => None // the query's own kmK(n)
        case _ => Some(math.max(kBase,
          math.round(n.toDouble / nBase * kBase).toInt))
      }
      // nprobe trades assignment fidelity for pruning (default 8;
      // SPARK_GRAFT_Q74_NPROBE sweeps it — on a uniform synth corpus the
      // coarse geometry is degenerate and kept-counts quantify the trade)
      val nprobe = sys.env.getOrElse("SPARK_GRAFT_Q74_NPROBE", "8").toInt
      val ann = if (schedule == "propN_ann") Some(nprobe) else None
      val kUsed = k.getOrElse(similarity.SimilarityQueries.kmK(n))
      val candPairs = similarity.SimilarityQueries
        .semCandidatePairs(spark, dir, k, ann).count()
      val kept = similarity.SimilarityQueries
        .semanticDedup(spark, dir, k, ann)
        .filter(col("kept")).count()
      // assign-only wall: the Lloyd fit + final assignment without the
      // pair stage — k ∝ N makes the PAIR volume linear but the brute
      // assign O(N·K·d) quadratic-in-N; propN_ann measures the same leg
      // with the two-level pruned search (O(√(K·nprobe)·d) per vector)
      def assignOnce(): Unit = similarity.SimilarityQueries
        .kmAssigned(spark, dir, k, ann)
        .write.format("noop").mode("overwrite").save()
      def runOnce(): Unit = similarity.SimilarityQueries
        .semanticDedup(spark, dir, k, ann)
        .write.format("noop").mode("overwrite").save()
      assignOnce(); runOnce() // warm (plan + codegen)
      val assignWalls = (1 to reps).map(_ => time(assignOnce()))
      val walls = (1 to reps).map(_ => time(runOnce()))
      System.gc()
      s"""{"sf":"$label","schedule":"$schedule","n":$n,"k":$kUsed,""" +
        s""""mean_cluster":${r3(n.toDouble / kUsed)},""" +
        ann.map(p => s""""nprobe":$p,""").getOrElse("") +
        s""""candidate_pairs":$candPairs,"kept_rows":$kept,""" +
        s""""assign_wall_min":${r3(assignWalls.min)},""" +
        s""""wall_reps":[${walls.map(r3).mkString(",")}],""" +
        s""""wall_min":${r3(walls.min)}}"""
    }
    println(s"""{"probe":"q74_production_k","base_n":$nBase,""" +
      s""""base_k":$kBase,"reps":$reps,""" +
      s""""note":"sqrtN = the oracle-pinned demo schedule; propN = production k ∝ N (mean cluster pinned at base); propN_ann = same k with IvfArgminL2 nprobe=8 ANN-assisted assignment",""" +
      s""""legs":[${legs.mkString(",")}]}""")
    spark.stop()
  }
}
