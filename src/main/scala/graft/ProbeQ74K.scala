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
    *
    * `planted:N:C:dir` legs (r16 verdict #5 — the realistic geometry the
    * uniform synth corpus is adversarial for): N vectors in C planted
    * clusters — anchor dims hash-uniform in [-1,1], members jittered
    * ±0.08 around their anchor (the IvfArgminL2Spec shape at probe
    * scale). Coarse pruning has real structure to exploit here, so
    * kept-rows agreement vs brute measures the production nprobe
    * operating point instead of its worst case.
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
    } else if (dirArg.startsWith("planted:")) {
      val Array(_, nStr, cStr, outDir) = dirArg.split(":", 4)
      val path = s"$outDir/embeddings.parquet"
      if (!new java.io.File(s"$path/_SUCCESS").exists()) {
        val c = cStr.toLong
        val anchor = pmod(col("id"), lit(c))
        spark.range(nStr.toLong)
          .select(col("id").as("vec_id"),
            transform(sequence(lit(0), lit(63)), dIdx =>
              ((pmod(xxhash64(anchor * 64 + dIdx), lit(1000000L))
                .cast("double") / 500000.0 - 1.0) +
                (pmod(xxhash64(col("id") * 64 + dIdx + lit(7919)),
                  lit(1000000L)).cast("double") / 500000.0 - 1.0) * 0.08)
                .cast("float")).as("embedding"))
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
      val label =
        if (a.startsWith("synth:")) "synth:" + a.split(":")(1)
        else if (a.startsWith("planted:"))
          "planted:" + a.split(":")(1) + ":" + a.split(":")(2)
        else d.split("/").last
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
    // ladder rungs run it selectively (the ANN leg is what scales there).
    // ANN variants take an optional ":nprobe" suffix (default 8) and a
    // "_kpp" marker for the k-means++ coarse fit (r16 verdict #5/#7):
    //   propN_ann, propN_ann:32, propN_ann_kpp, propN_ann_kpp:32
    val schedules = sys.env.get("SPARK_GRAFT_Q74_SCHEDULES")
      .map(_.split(",").toSeq)
      .getOrElse(Seq("sqrtN", "propN", "propN_ann"))
    // per-dir brute-propN kept flags, built lazily on first use — the
    // reference for the ANN legs' kept-rows agreement (distributed
    // compare; never collected)
    val bruteKeptCache =
      scala.collection.mutable.Map.empty[String, org.apache.spark.sql.DataFrame]
    val legs = for {
      (label, dir) <- dirs
      schedule <- schedules
    } yield {
      val n = Tables.rowCount(spark, dir, "embeddings")
      // propN: k grows with the corpus so mean cluster size stays at the
      // base corpus's N₀/k₀ — the SemDeDup production sizing.
      // propN_ann (r16): same k schedule, but every Lloyd assignment pass
      // is ANN-assisted (IvfArgminL2) — the production answer to the
      // O(N·K) brute assign leg this probe exposed in r15.
      val k = schedule match {
        case "sqrtN" => None // the query's own kmK(n)
        case _ => Some(math.max(kBase,
          math.round(n.toDouble / nBase * kBase).toInt))
      }
      val defaultNprobe = sys.env.getOrElse("SPARK_GRAFT_Q74_NPROBE", "8").toInt
      val nprobe = schedule.split(":").lift(1).map(_.toInt).getOrElse(defaultNprobe)
      val base = schedule.split(":").head
      val isAnn = base.startsWith("propN_ann")
      val kpp = base.endsWith("_kpp")
      val ann = if (isAnn) Some(nprobe) else None
      val kUsed = k.getOrElse(similarity.SimilarityQueries.kmK(n))
      val candPairs = similarity.SimilarityQueries
        .semCandidatePairs(spark, dir, k, ann, kpp).count()
      val kept = similarity.SimilarityQueries
        .semanticDedup(spark, dir, k, ann, kpp)
        .filter(col("kept")).count()
      // kept-rows AGREEMENT vs the brute propN reference at the same k
      // (r16 verdict #5: the fidelity claim must be a row-level
      // measurement on this geometry, not a kept-count coincidence) —
      // only for ANN legs, and only when propN runs on this dir too
      val agreement: Option[Double] =
        if (!isAnn || !schedules.exists(_.split(":").head == "propN")) None
        else {
          val ref = bruteKeptCache.getOrElseUpdate(dir,
            similarity.SimilarityQueries.semanticDedup(spark, dir, k, None)
              .select(col("vec_id"), col("kept").as("kept_ref"))
              .localCheckpoint())
          val agree = similarity.SimilarityQueries
            .semanticDedup(spark, dir, k, ann, kpp)
            .select(col("vec_id"), col("kept"))
            .join(ref, "vec_id")
            .filter(col("kept") === col("kept_ref")).count()
          Some(agree.toDouble / n)
        }
      // assign-only wall: the Lloyd fit + final assignment without the
      // pair stage — k ∝ N makes the PAIR volume linear but the brute
      // assign O(N·K·d) quadratic-in-N; propN_ann measures the same leg
      // with the two-level pruned search (O(√(K·nprobe)·d) per vector)
      def assignOnce(): Unit = similarity.SimilarityQueries
        .kmAssigned(spark, dir, k, ann, kpp)
        .write.format("noop").mode("overwrite").save()
      def runOnce(): Unit = similarity.SimilarityQueries
        .semanticDedup(spark, dir, k, ann, kpp)
        .write.format("noop").mode("overwrite").save()
      assignOnce(); runOnce() // warm (plan + codegen)
      val assignWalls = (1 to reps).map(_ => time(assignOnce()))
      val walls = (1 to reps).map(_ => time(runOnce()))
      System.gc()
      s"""{"sf":"$label","schedule":"$schedule","n":$n,"k":$kUsed,""" +
        s""""mean_cluster":${r3(n.toDouble / kUsed)},""" +
        ann.map(p => s""""nprobe":$p,"coarse":"${if (kpp) "kpp" else "min_cid"}",""")
          .getOrElse("") +
        agreement.map(a =>
          s""""kept_agreement_vs_brute":${math.round(a * 100000.0) / 100000.0},""")
          .getOrElse("") +
        s""""candidate_pairs":$candPairs,"kept_rows":$kept,""" +
        s""""assign_wall_min":${r3(assignWalls.min)},""" +
        s""""wall_reps":[${walls.map(r3).mkString(",")}],""" +
        s""""wall_min":${r3(walls.min)}}"""
    }
    println(s"""{"probe":"q74_production_k","base_n":$nBase,""" +
      s""""base_k":$kBase,"reps":$reps,""" +
      s""""note":"sqrtN = the oracle-pinned demo schedule; propN = production k ∝ N (mean cluster pinned at base); propN_ann[:p] = same k with IvfArgminL2 nprobe=p (default 8) ANN-assisted assignment; _kpp = k-means++ coarse fit instead of smallest-cid; kept_agreement_vs_brute = fraction of rows whose kept flag matches the brute propN reference",""" +
      s""""legs":[${legs.mkString(",")}]}""")
    spark.stop()
  }
}
