package graft

import org.apache.spark.sql.functions._

/** Builder-side probe for q86's WIN case (round-12 verdict #5): the gated
  * sf run is the wrong asymmetry — ~10⁵-10⁶ train shingles saturate the
  * 2²⁰-bit filter, every probe passes, and q86 reads as q58 plus overhead.
  *
  * The first run of this probe (small benchmark-suite reference side, huge
  * probe side) produced its own finding, kept in the artifact: with a
  * reference side small enough to BROADCAST, Catalyst turns the exact semi
  * join into a broadcast semi join and the probe postings never cross an
  * exchange either way — exact and bloom tie (~28 shuffle rows each), and
  * the bloom pass is pure scan-side overhead. q86's real win regime is the
  * asymmetric MIDDLE: a reference set too large to broadcast as an exact
  * string set (Spark's 10 MB default ≈ a few hundred thousand distinct
  * shingles; a million-doc eval suite carries 10⁷-10⁸) but representable
  * in a FIXED-SIZE bloom (bits/item chosen for the target fp rate). There
  * the exact path degrades to a shuffle join over every probe posting
  * while the bloom path still drops non-matches inside the scan stage.
  *
  * This probe builds that regime on demand: the reference side is a
  * doc_id-hash slice of `trainDir` (slice and bloom sizing are CLI
  * arguments), the probe side is every document of each probe dir, and
  * both paths run under a ShuffleTally recording what actually moved.
  * Emits one JSON line per probe dir: wall seconds, shuffle rows/bytes
  * per path, measured scan-side drop rate, and the exact-path join
  * strategy actually planned (broadcast vs shuffle — the regime marker).
  *
  * Usage: ProbeBloomDecon <trainDir> <trainSlice> <bloomBitsLog2> <probeDir...>
  *   e.g. ProbeBloomDecon /tmp/sf1 0.5 25 /tmp/sf1 /tmp/sf100
  */
object ProbeBloomDecon {

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: ProbeBloomDecon <trainDir> <trainSlice> <bloomBitsLog2> <probeDir...>")
    val trainDir = args(0)
    val trainSlice = args(1).toDouble
    val bloomBits = 1L << args(2).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tally = new Bench.ShuffleTally
    spark.sparkContext.addSparkListener(tally)

    val n = text.TextQueries.DecontaminationNgram
    def toks = split(col("text"), " ") // q58's tokenization
    def shingleDocs(dir: String) = {
      val sh = transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " "))
      Tables.documents(spark, dir).select(col("doc_id"),
        when(size(toks) >= n, array_distinct(sh))
          .otherwise(array().cast("array<string>")).as("shingles"))
    }
    // FIXED reference side (does not grow with the probe dirs)
    val trainShingles = shingleDocs(trainDir)
      .filter(graft.hashBucket01(col("doc_id")) < trainSlice)
      .select(explode(col("shingles")).as("shingle")).distinct()
    trainShingles.cache()
    val nTrainShingles = trainShingles.count()
    val bf = trainShingles
      .agg(functions.BloomFunctions.bloomAgg(spark, xxhash64(col("shingle")),
        math.max(1L, nTrainShingles), bloomBits).as("bf"))
      .head.getAs[Array[Byte]]("bf")

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
    }
    for (probeDir <- args.drop(3)) {
      val postings = shingleDocs(probeDir)
        .select(col("doc_id"), explode(col("shingles")).as("shingle"))

      // measured scan-side drop rate (untimed counting jobs)
      val nPostings = postings.count()
      val nSurvivors = postings.filter(functions.BloomFunctions
        .bloomContains(spark, lit(bf), xxhash64(col("shingle")))).count()

      // ends in an aggregate so the timed action below (head of a 1-row
      // result) cannot prune any of the measured work — the r13 protocol
      // rule (no timed count() in probe paths; Bench.materialize scaladoc)
      def contaminatedCount(prefiltered: org.apache.spark.sql.DataFrame) =
        prefiltered.join(trainShingles, Seq("shingle"), "left_semi")
          .agg(count_distinct(col("doc_id")).as("contaminated_docs"))
      // regime marker: what Catalyst actually planned for the exact join
      val exactPlan = contaminatedCount(postings)
        .queryExecution.executedPlan.toString
      val exactStrategy =
        if (exactPlan.contains("BroadcastHashJoin")) "broadcast"
        else "shuffle"

      def leg(prefiltered: org.apache.spark.sql.DataFrame): (Double, Long, Long, Long) = {
        System.gc()
        val (b0, r0) = tally.settled()
        val (sec, hits) =
          timed(contaminatedCount(prefiltered).head.getLong(0))
        val (b1, r1) = tally.settled()
        (sec, hits, r1 - r0, b1 - b0)
      }
      // warm both paths once (plan compile), then measure
      leg(postings)
      val (exactSec, exactHits, exactRows, exactBytes) = leg(postings)
      val bloomSide = postings.filter(functions.BloomFunctions
        .bloomContains(spark, lit(bf), xxhash64(col("shingle"))))
      leg(bloomSide)
      val (bloomSec, bloomHits, bloomRows, bloomBytes) = leg(bloomSide)
      require(exactHits == bloomHits,
        s"paths disagree: exact=$exactHits bloom=$bloomHits")

      def r3(x: Double) = math.round(x * 1000.0) / 1000.0
      println(s"""{"probe":"bloom_decon","probe_dir":"$probeDir",""" +
        s""""train_dir":"$trainDir","train_slice":$trainSlice,""" +
        s""""train_shingles":$nTrainShingles,"bloom_bits":$bloomBits,""" +
        s""""exact_join_strategy":"$exactStrategy",""" +
        s""""probe_postings":$nPostings,"bloom_survivors":$nSurvivors,""" +
        s""""scan_drop_rate":${r3(1.0 - nSurvivors.toDouble / nPostings)},""" +
        s""""contaminated_docs":$exactHits,""" +
        s""""exact":{"sec":${r3(exactSec)},"shuffle_rows":$exactRows,"shuffle_bytes":$exactBytes},""" +
        s""""bloom":{"sec":${r3(bloomSec)},"shuffle_rows":$bloomRows,"shuffle_bytes":$bloomBytes}}""")
    }
    spark.stop()
  }
}
