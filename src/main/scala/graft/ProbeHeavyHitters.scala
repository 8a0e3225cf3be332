package graft

import org.apache.spark.sql.functions._

/** Builder-side probe for q85's design claim (round-12 verdict #9): the
  * Misra-Gries prefilter + exact-confirm path was ARGUED to beat a plain
  * partial-agg GROUP BY on a non-saturating n-gram domain (candidates
  * bounded at k·P rows vs a corpus-sized distinct-gram shuffle) but never
  * measured. Runs both plans over each given corpus dir with a
  * ShuffleTally recording shuffle rows/bytes:
  *
  *   - mg: `HeavyHitters.heavyHitters` — per-partition MG summaries
  *     (≤ k+1 rows/partition cross the exchange) + one exact confirm scan
  *     whose groupBy only sees broadcast-semi-join survivors;
  *   - plain: the oracle definition run as a Spark plan — groupBy over
  *     EVERY distinct bigram (the partial agg dedups per map task, but
  *     every distinct (gram, partial-count) row still shuffles), then the
  *     total-count threshold.
  *
  * Both must return identical heavy-hitter sets (asserted). Emits one
  * JSON line per dir. Usage: ProbeHeavyHitters <dir1> [dir2 ...]
  */
object ProbeHeavyHitters {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProbeHeavyHitters <dir...>")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tally = new Bench.ShuffleTally
    spark.sparkContext.addSparkListener(tally)
    val k = text.HeavyHitters.MgCounters

    def bigrams(dir: String) = {
      val toks = split(col("text"), " ")
      Tables.documents(spark, dir).select(
        explode(when(size(toks) >= 2,
          transform(sequence(lit(1), size(toks) - 1),
            i => array_join(slice(toks, i, lit(2)), " ")))
          .otherwise(array().cast("array<string>"))).as("gram"))
    }

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
    }
    def leg[A](f: => A): (Double, A, Long, Long) = {
      System.gc()
      val (b0, r0) = tally.settled()
      val (sec, a) = timed(f)
      val (b1, r1) = tally.settled()
      (sec, a, r1 - r0, b1 - b0)
    }

    for (dir <- args) {
      def mgRun() = text.HeavyHitters.heavyHitters(spark, dir, k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      def plainRun() = {
        val g = bigrams(dir)
        g.groupBy("gram").agg(count(lit(1)).as("n_occurrences"))
          .crossJoin(broadcast(g.agg(count(lit(1)).as("total"))))
          .filter(col("n_occurrences").cast("double") >
            col("total").cast("double") / k)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      mgRun(); plainRun() // warm both plans once
      val (mgSec, mgHits, mgRows, mgBytes) = leg(mgRun())
      val (plSec, plHits, plRows, plBytes) = leg(plainRun())
      require(mgHits == plHits,
        s"plans disagree at $dir: mg=${mgHits.size} plain=${plHits.size}")

      def r3(x: Double) = math.round(x * 1000.0) / 1000.0
      println(s"""{"probe":"heavy_hitters","dir":"$dir","k":$k,""" +
        s""""hitters":${mgHits.size},""" +
        s""""mg":{"sec":${r3(mgSec)},"shuffle_rows":$mgRows,"shuffle_bytes":$mgBytes},""" +
        s""""plain":{"sec":${r3(plSec)},"shuffle_rows":$plRows,"shuffle_bytes":$plBytes}}""")
    }
    spark.stop()
  }
}
