package graft

import org.apache.spark.sql.functions._

/** Builder-side scale probe for the q76/q51 band-width ceiling (r16 task
  * #1): the packed one-long signature clamps the adaptive
  * ~8-rows-per-bucket band width at 15 bits, so past n ≈ 2¹⁵·8 ≈ 262k
  * vectors mean bucket occupancy grows linearly in N and candidate volume
  * picks up a ~N²/2¹⁶ birthday term on ANY corpus. q93's wide layout
  * (functions.RhBandKeys — one long per band) lets the width keep
  * tracking log2(N/8).
  *
  * This probe runs the SAME pipeline (similarity.SimilarityQueries
  * .rhWideCandidates) at both widths — `clamped` forces bandBits = 15,
  * `wide` uses the unclamped rule — on a distinct-vector ladder, so the
  * measured difference is the band width alone, not the payload shape.
  * Per leg it reports band width, bucket-occupancy stats (mean/p99/max
  * over the 4·2^bandBits bucket space), emit-once candidate-pair count,
  * and min-of-reps walls for the full q93 aggregate tail; the artifact
  * tail adds the ladder-end-to-end growth exponents the verdict asked
  * for (flat occupancy + candidate exponent ≤ 1.1 on the wide rung).
  *
  * Usage: ProbeRhWide <dir|synth:N:dir>... (reps via
  * SPARK_GRAFT_PROBE_REPS, default 2). Emits one JSON line.
  */
object ProbeRhWide {

  /** `synth:N:dir` legs — ProbeQ74K's convention: N DISTINCT hash-derived
    * vectors (uniform in [-1,1]^64), so candidate volume is the banding
    * arithmetic itself (birthday collisions), not replica variant
    * families.
    */
  private def resolveDir(spark: org.apache.spark.sql.SparkSession,
      dirArg: String): (String, String) =
    if (dirArg.startsWith("synth:")) {
      val Array(_, nStr, outDir) = dirArg.split(":", 3)
      val path = s"$outDir/embeddings.parquet"
      if (!new java.io.File(s"$path/_SUCCESS").exists()) {
        spark.range(nStr.toLong)
          .select(col("id").as("vec_id"),
            transform(sequence(lit(0), lit(63)), dIdx =>
              (pmod(xxhash64(col("id") * 64 + dIdx), lit(1000000L))
                .cast("double") / 500000.0 - 1.0).cast("float"))
              .as("embedding"))
          .write.mode("overwrite").parquet(path)
      }
      (s"synth:$nStr", outDir)
    } else (dirArg.split("/").last, dirArg)

  def main(args: Array[String]): Unit = {
    require(args.length >= 1,
      "usage: ProbeRhWide <dir...|synth:N:dir...> [reps via SPARK_GRAFT_PROBE_REPS]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dirs = args.toSeq.map(a => resolveDir(spark, a))
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "2").toInt

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def r3(x: Double) = math.round(x * 1000.0) / 1000.0

    import similarity.SimilarityQueries.{rhWideBandBits, rhWideBanded, rhWideCandidates}

    case class Leg(label: String, mode: String, n: Long, bandBits: Int,
        occMean: Double, occP99: Long, occMax: Long, cands: Long,
        wallMin: Double, walls: Seq[Double]) {
      /** Target mean occupancy n/2^bits — the ceil quantization's phase.
        * Rungs at equal phase isolate the intrinsic growth from the
        * ±half-bit oscillation of the integer band width.
        */
      def phase: Double = n.toDouble / (1L << bandBits)
      /** Measured candidates over the uniform-key birthday prediction
        * 4·C(n,2)/2^bits — the angle-concentration (Jensen) boost of
        * cosine-LSH keys: E[(1−θ/π)^bits] > 2^−bits because pair angles
        * concentrate around π/2 with positive variance. This factor, not
        * bucket-count arithmetic, is whatever exceeds exponent 1.0 on
        * same-phase rungs.
        */
      def boost: Double =
        cands / (4.0 * n * (n - 1) / 2.0 / (1L << bandBits))
    }

    val legs = for {
      (label, dir) <- dirs
      mode <- Seq("clamped15", "wide")
    } yield {
      val n = Tables.rowCount(spark, dir, "embeddings")
      val bandBits = mode match {
        case "clamped15" => math.min(15, rhWideBandBits(n)) // the q76 rule
        case _ => rhWideBandBits(n)
      }
      // bucket occupancy over NON-EMPTY buckets (the quantity that drives
      // per-bucket pair work; empty cells of the 4·2^bits space are free)
      val occ = rhWideBanded(spark, dir, bandBits)
        .groupBy("cid").agg(count(lit(1)).as("c"))
        .agg(avg("c").as("mean"),
          expr("percentile(c, 0.99)").as("p99"), max("c").as("mx"))
        .collect()(0)
      val cands = rhWideCandidates(spark, dir, Some(bandBits)).count()
      def statsOnce(): Unit = rhWideCandidates(spark, dir, Some(bandBits))
        .withColumn("cosine",
          round(functions.CosineSimilarity.cosine_similarity(
            spark, "va.e", "vb.e"), 6))
        .filter(col("cosine") >= 0.35)
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("cosine").cast("decimal(18,6)")).cast("double").as("sum_cos6"),
          min("cosine").as("min_cosine"), max("cosine").as("max_cosine"))
        .write.format("noop").mode("overwrite").save()
      statsOnce() // warm (plan + codegen)
      val walls = (1 to reps).map(_ => time(statsOnce()))
      System.gc()
      Leg(label, mode, n, bandBits, occ.getDouble(0),
        math.round(occ.getDouble(1)), occ.getLong(2), cands,
        walls.min, walls)
    }

    // ladder-end-to-end exponents (first vs last rung per mode), plus a
    // SAME-PHASE pair — earliest rung whose quantization phase matches
    // the last's within 10% — which removes the integer band width's
    // ±half-bit oscillation from the exponent
    def exp(first: Leg, last: Leg, v: Leg => Double): Double =
      math.log(v(last) / v(first)) / math.log(last.n.toDouble / first.n)
    val byMode = legs.groupBy(_.mode).map { case (m, ls) =>
      val s = ls.sortBy(_.n)
      m -> (if (s.size >= 2) {
        val last = s.last
        val samePhase = s.dropRight(1)
          .find(l => math.abs(l.phase / last.phase - 1.0) < 0.10)
        val sp = samePhase.map { f =>
          s""""cand_exponent_same_phase":${r3(exp(f, last, _.cands.toDouble))},""" +
            s""""wall_exponent_same_phase":${r3(exp(f, last, _.wallMin))},""" +
            s""""same_phase_pair":["${f.label}","${last.label}"],"""
        }.getOrElse("")
        s"""{"cand_exponent":${r3(exp(s.head, last, _.cands.toDouble))},""" +
          s""""wall_exponent":${r3(exp(s.head, last, _.wallMin))},""" + sp +
          s""""occ_mean_first":${r3(s.head.occMean)},"occ_mean_last":${r3(last.occMean)}}"""
      } else "{}")
    }

    val legsJson = legs.map { l =>
      s"""{"sf":"${l.label}","mode":"${l.mode}","n":${l.n},""" +
        s""""band_bits":${l.bandBits},"occ_mean":${r3(l.occMean)},""" +
        s""""occ_p99":${l.occP99},"occ_max":${l.occMax},""" +
        s""""candidate_pairs":${l.cands},""" +
        s""""phase":${r3(l.phase)},"jensen_boost":${r3(l.boost)},""" +
        s""""wall_reps":[${l.walls.map(r3).mkString(",")}],""" +
        s""""wall_min":${r3(l.wallMin)}}"""
    }
    println(s"""{"probe":"rh_wide_band_width","reps":$reps,""" +
      s""""note":"clamped15 = the q76 one-long rule; wide = q93 rh_band_keys, bandBits tracks log2(N/8). Distinct-vector corpus: candidate volume IS the banding arithmetic.",""" +
      s""""exponents":{${byMode.map { case (k, v) => s""""$k":$v""" }.mkString(",")}},""" +
      s""""legs":[${legsJson.mkString(",")}]}""")
    spark.stop()
  }
}
