package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Builder-side scale probe for the IVF family (round-13 verdict #6): q38
  * runs demo constants (IvfK=16, NProbe=2 — `similarity/IvfPq.scala`
  * documents them as demo scale), so its 100 TB story ("a query touches
  * nprobe partitions, not the corpus") was argued, never measured. This
  * probe builds the PRODUCTION shape on the replica corpora and measures
  * the claim directly:
  *
  *   - coarse quantizer with K ≈ √N lists (the FAISS sizing rule),
  *     Lloyd-trained on a deterministic hash-sample of the corpus (training
  *     cost must not scale with N; FAISS trains on samples for the same
  *     reason), first-K init + 6dp rounding + ties-on-id per the house
  *     determinism conventions;
  *   - ONE full assignment pass, then the index written as parquet
  *     PARTITIONED BY list id — at cluster scale this layout IS the index:
  *     a probed list is a partition directory, so a query's list filter is
  *     partition pruning, not row filtering;
  *   - query leg: for NQ queries, nprobe nearest lists each, candidates
  *     read back THROUGH the partitioned layout with a `list_id IN (...)`
  *     filter, exact re-rank on the candidates (IVF-Flat semantics — the
  *     PQ-code compression axis is q90/q38's subject, not this probe's);
  *   - brute leg: same queries, full-corpus scan (q40's shape).
  *
  * Measured per leg via a task-metrics input tally: parquet ROWS READ
  * (the partition-pruning proof — the IVF leg's reads are the probed
  * lists' rows, not N), files touched per query batch, wall seconds, and
  * recall@k of IVF vs the brute ranking (the quantity nprobe trades —
  * reporting locality without recall would be theater).
  *
  * Usage: ProbeIvfPq <replicaDir|synth:N:dir> <layoutDir>
  *   [nprobes-csv=8,16,32,64] [nq=16] [k=10]
  * r15: sweeps the nprobe list against ONE shared layout + brute ranking
  * and emits a recall-vs-rows-read curve (BENCH_r15_ivfpq_probe.json);
  * `synth:N:dir` generates a non-degenerate corpus (N distinct
  * hash-derived vectors) so recall isn't dominated by the replica
  * corpus's variant families. Assignment runs the q69 native argmin.
  */
object ProbeIvfPq {

  /** Sums parquet-scan input rows across finished tasks (the read-volume
    * companion to Bench.ShuffleTally; same listener-bus caveats).
    */
  final class InputTally extends org.apache.spark.scheduler.SparkListener {
    val rows = new java.util.concurrent.atomic.AtomicLong(0L)
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        rows.addAndGet(m.inputMetrics.recordsRead)
        bytes.addAndGet(m.inputMetrics.bytesRead)
      }
    }
    def settled(): (Long, Long) = {
      var prev = (-1L, -1L)
      var cur = (rows.get(), bytes.get())
      var stable = 0
      var spins = 0
      while (stable < 3 && spins < 200) {
        prev = cur; Thread.sleep(10); cur = (rows.get(), bytes.get())
        spins += 1
        if (cur == prev) stable += 1 else stable = 0
      }
      cur
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ProbeIvfPq <replicaDir|synth:N:dir> <layoutDir> [nprobes-csv] [nq] [k]")
    val dirArg = args(0)
    val layout = args(1)
    // r15 (r14 verdict "what's missing" #4): a single nprobe measured
    // locality without its recall price; the sweep measures the TRADE
    val nprobes = args.lift(2).getOrElse("8,16,32,64")
      .split(",").map(_.trim.toInt).toSeq.sorted
    val nq = args.lift(3).map(_.toInt).getOrElse(16)
    val k = args.lift(4).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tally = new InputTally
    spark.sparkContext.addSparkListener(tally)

    // `synth:N:dir` — generate a NON-degenerate corpus (N distinct
    // hash-derived vectors, uniform per-dim in [-1, 1)) at dir if absent:
    // the replica corpora concentrate ~100 near-identical variants per
    // base vector into few cells, which dominates recall@k; this leg
    // separates the variant-family artifact from the nprobe trade.
    val dir = if (dirArg.startsWith("synth:")) {
      val Array(_, nStr, outDir) = dirArg.split(":", 3)
      val path = s"$outDir/embeddings.parquet"
      if (!new java.io.File(path).exists()) {
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

    def l2sq6(a: String, b: String) =
      round(graft.functions.L2Distance.l2_sq(spark, a, b), 6)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .localCheckpoint() // pin N rows; training/assign must not re-derive
    val n = emb.count()
    val listK = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
    // deterministic ~8k-vector training sample: every ceil(N/8192)-th id
    val step = math.max(1L, n / 8192L)
    val sample = emb.filter(col("vec_id") % step === 0).localCheckpoint()

    // r15: assignment via the exchange-free native argmin (the q69 fix —
    // identical 6dp-round + tie-on-cid semantics; the old join +
    // min(struct) form planned Sort+SortAggregate over N·K vector-payload
    // rows and was this probe's 147 s assign leg at 100×)
    def assign(cents: DataFrame, vecs: DataFrame): DataFrame = {
      val centsRow = cents.agg(collect_list(col("cid")).as("cids"),
        flatten(collect_list(col("cv"))).as("cvs_flat"))
      vecs.crossJoin(broadcast(centsRow))
        .select(col("vec_id"),
          graft.functions.ArgminL2.argmin_l2(spark, "v", "cids", "cvs_flat")
            .as("m"),
          col("v"))
        .select(col("vec_id"), col("m.cid").as("cid"), col("v"))
    }
    def update(assigned: DataFrame): DataFrame =
      assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cid", "dim")
        .agg((sum(round(col("x"), 12).cast("decimal(28,12)")).cast("double")
          / count(lit(1))).as("m"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          e => e("m")).as("cv"))

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // --- build: sample-trained coarse codebook, one full assign, layout ---
    val (trainSec, cents) = time {
      var c = sample.orderBy("vec_id").limit(listK)
        .select(col("vec_id").cast("int").as("cid"), col("v").as("cv"))
        .localCheckpoint()
      for (_ <- 1 to 2)
        c = update(assign(c, sample)).localCheckpoint()
      // re-key cids densely 0..K-1 (Lloyd can drop empty cells)
      c.select(col("cid"), col("cv"))
        .withColumn("cid", row_number().over(
          Window.orderBy("cid")).cast("int") - 1)
        .localCheckpoint()
    }
    val nLists = cents.count()
    val (assignSec, _) = time {
      assign(cents, emb)
        .select(col("vec_id"), col("v"), col("cid").as("list_id"))
        .write.mode("overwrite").partitionBy("list_id").parquet(layout)
    }
    val listSizes = spark.read.parquet(layout)
      .groupBy("list_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

    // --- probe sets: up to max(nprobes) nearest lists per query -----------
    val maxNp = nprobes.max
    val qv = emb.filter(col("vec_id") < nq)
      .select(col("vec_id").as("qid"), col("v").as("qvec"))
      .localCheckpoint()
    val wp = Window.partitionBy("qid").orderBy(asc("dist2"), asc("cid"))
    val probedAll = qv.crossJoin(broadcast(cents))
      .withColumn("dist2", l2sq6("qvec", "cv"))
      .withColumn("rk", row_number().over(wp))
      .filter(col("rk") <= maxNp)
      .select(col("qid"), col("cid"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))

    def topk(scored: DataFrame): DataFrame = {
      val w = Window.partitionBy("qid").orderBy(asc("dist2"), asc("vec_id"))
      scored.filter(col("qid") =!= col("vec_id"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("qid", "rank", "vec_id", "dist2")
    }
    def pairs(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getLong(0), r.getLong(2))).toSet

    // --- brute leg once: full scan (q40's shape) over the SAME files ------
    def bruteLeg(): Array[org.apache.spark.sql.Row] = {
      val cand = spark.read.parquet(layout)
        .crossJoin(broadcast(qv))
        .withColumn("dist2", l2sq6("v", "qvec"))
      topk(cand).orderBy("qid", "rank").collect()
    }
    bruteLeg() // warm
    val in2 = tally.settled()
    val (bruteSec, bruteRes) = time(bruteLeg())
    val in3 = tally.settled()
    val bruteRows = in3._1 - in2._1
    val brutePairs = pairs(bruteRes)

    // --- IVF leg per nprobe: read ONLY the probed partitions --------------
    def r3(x: Double) = math.round(x * 1000.0) / 1000.0
    val legs = nprobes.map { np =>
      val probed = probedAll.filter(_._3 <= np).map(t => (t._1, t._2))
      val probedLists = probed.map(_._2).distinct.sorted
      val candRows = probed.map { case (_, c) => listSizes.getOrElse(c, 0L) }.sum
      val probeDf = spark.createDataFrame(probed.toSeq).toDF("qid", "list_id")
      def ivfLeg(): Array[org.apache.spark.sql.Row] = {
        val cand = spark.read.parquet(layout)
          .filter(col("list_id").isin(probedLists.map(Int.box): _*))
          .join(broadcast(probeDf), Seq("list_id"))
          .join(broadcast(qv), Seq("qid"))
          .withColumn("dist2", l2sq6("v", "qvec"))
        topk(cand).orderBy("qid", "rank").collect()
      }
      ivfLeg() // warm (plan compile)
      val in0 = tally.settled()
      val (ivfSec, ivfRes) = time(ivfLeg())
      val in1 = tally.settled()
      val ivfRows = in1._1 - in0._1
      val recall = pairs(ivfRes).intersect(brutePairs).size.toDouble /
        brutePairs.size
      s"""{"nprobe":$np,"partitions_touched":${probedLists.length},""" +
        s""""candidate_rows_from_list_sizes":$candRows,""" +
        s""""sec":${r3(ivfSec)},"parquet_rows_read":$ivfRows,""" +
        s""""rows_read_ratio":${r3(bruteRows.toDouble / math.max(1L, ivfRows))},""" +
        s""""corpus_fraction_touched":${r3(candRows.toDouble / n)},""" +
        s""""recall_at_k":${r3(recall)}}"""
    }

    // candidate volumes of the OTHER ANN rungs on this corpus, for the
    // ladder table (arithmetic from measured list sizes, not timed runs):
    // q40/q90 score all N per query; q49 demo probes 1 of 16 lists.
    println(s"""{"probe":"ivfpq_recall_curve","dir":"$dir","n_vectors":$n,""" +
      s""""n_lists":$nLists,"list_k_rule":"ceil(sqrt(N))",""" +
      s""""nq":$nq,"k":$k,"train_sec":${r3(trainSec)},""" +
      s""""assign_write_sec":${r3(assignSec)},""" +
      s""""brute":{"sec":${r3(bruteSec)},"parquet_rows_read":$bruteRows},""" +
      s""""legs":[${legs.mkString(",")}],""" +
      s""""other_rungs_candidates_per_query":{"q40_brute":$n,"q90_pq_adc":$n,""" +
      s""""q49_ivf_demo":${n / 16}}}""")
    spark.stop()
  }
}
