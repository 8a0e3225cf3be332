package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global order statistics WITHOUT a global sort — selection by
  * histogram bisection, the classic distributed-selection shape.
  *
  * q13's exact per-group percentiles lean on Catalyst's `percentile`,
  * whose state is O(distinct values) per group — right for many small
  * groups, wrong for one corpus-wide quantile over 100 TB where a global
  * sort (`orderBy` + pick row k) shuffles everything to order everything.
  * Selection does it with counting passes instead:
  *
  *   pass 1 (scan): min / max / count — locates the value range and the
  *     target ranks;
  *   pass 2 (scan): histogram of B=4096 uniform buckets over [lo, hi] —
  *     a groupBy on a computed bucket id whose shuffle is AT MOST B rows
  *     per map task regardless of data; the collected histogram (B rows,
  *     bounded, data-independent) tells the driver which bucket holds
  *     each rank and how many values precede it;
  *   pass 2b (scan, only when a candidate bucket is pathological — more
  *     than `recurseBound` rows): ONE more counting scan sub-histograms
  *     every hot candidate bucket at once (groupBy on (bucket, subbucket),
  *     <= B*B bounded shuffle rows but only hot buckets' rows survive the
  *     filter), narrowing each rank to a subbucket ~B× smaller. The same
  *     scan also records each subbucket's min/max: a subbucket whose
  *     min == max is ONE repeated value — the rank's answer is that value
  *     directly, no sort at all. That is precisely the worst case for
  *     bisection (equal values can never be split), and it costs nothing;
  *   pass 3 (scan): only candidate-(sub)bucket rows survive the pushed
  *     filter; a per-(sub)bucket window row_number picks rank (k - below)
  *     inside each. Skipped entirely when 2b resolved every rank.
  *
  * Three-to-four cheap scans replace one full-shuffle sort. Bucket (and
  * subbucket) residency is decided by the SAME expression in the counting
  * pass and the candidate filter, so float boundary placement cannot
  * disagree between the histogram and the filter. All-equal corpora
  * short-circuit after pass 1; empty corpora return an empty frame.
  *
  * Oracle-exact by construction: every pass counts or compares, the
  * output is an actual element of the column (rank floor(q*(n-1))+1,
  * 1-based — ties can order arbitrarily, the VALUE at a rank is unique),
  * and the one float computation (q*(n-1)) is the same IEEE double
  * product on both engines.
  */
object OrderStatistics {

  val Buckets = 4096
  val Quantiles: Seq[Double] = Seq(0.5, 0.9, 0.99)

  /** A candidate bucket with more rows than this gets one recursion level
    * (pass 2b) before the window sort. 4M doubles sort in-task in well
    * under a second, so below this the extra scan costs more than it
    * saves; above it the sub-histogram caps pass 3's per-task sort at
    * ~bound/B rows (or answers repeated-value buckets outright).
    */
  val RecurseBound: Long = 4L << 20

  val q88ExactQuantiles: Q = (s, d) => exactQuantiles(s, d)

  /** Parameterized core. `recurseBound` is the pass-2b trigger; the spec
    * drives it at a tiny bound so recursion actually fires on test data.
    */
  def exactQuantiles(s: SparkSession, d: String,
      quantiles: Seq[Double] = Quantiles, buckets: Int = Buckets,
      recurseBound: Long = RecurseBound): DataFrame = {
    import s.implicits._
    val v = Tables.events(s, d).select(col("value"))

    // pass 1: range + count
    val r0 = v.agg(min("value").as("lo"), max("value").as("hi"),
      count(lit(1)).as("n")).head
    val n = r0.getLong(2)
    if (n == 0L || r0.isNullAt(0)) { // empty (or all-null) corpus: no ranks
      return Seq.empty[(Double, Double)].toDF("quantile", "value")
    }
    val (lo, hi) = (r0.getDouble(0), r0.getDouble(1))
    val ranks = quantiles.map(q => math.floor(q * (n - 1)).toLong + 1L)

    if (lo == hi) { // all-equal corpus: every quantile is the value itself
      return quantiles.map(q => (q, lo)).toDF("quantile", "value")
        .orderBy("quantile")
    }

    // shared bucket expression (passes 2, 2b, 3): uniform over [lo, hi],
    // top edge clamped into the last bucket
    val width = (hi - lo) / buckets
    val bucket = least(floor((col("value") - lit(lo)) / lit(width)),
      lit(buckets - 1L)).cast("long")
    // subbucket within bucket b: same construction over b's sub-range,
    // derived per-row from the b column so one expression serves all hot
    // buckets in one scan (identical doubles in 2b and 3)
    val subWidth = width / buckets
    val subBucket = least(
      floor((col("value") - (lit(lo) + col("b") * lit(width))) / lit(subWidth)),
      lit(buckets - 1L)).cast("long")

    // pass 2: histogram, collected bounded (<= B rows, data-independent)
    val hist = v.groupBy(bucket.as("b")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)

    // driver: each rank's bucket + count of values strictly below it
    def locate(h: Seq[(Long, Long)], k: Long): (Long, Long) = {
      var cum = 0L
      for ((b, c) <- h) {
        if (k <= cum + c) return (b, cum)
        cum += c
      }
      sys.error(s"rank $k beyond histogram total $cum")
    }
    val targets: Seq[(Double, Long, Long, Long)] = // (q, rank, bucket, below)
      quantiles.zip(ranks).map { case (q, k) =>
        val (b, below) = locate(hist, k)
        (q, k, b, below)
      }

    // pass 2b: one sub-histogram scan over ALL hot candidate buckets.
    // subWidth underflowing to +0.0 (hi - lo below ~B²·ulp) would make the
    // subbucket expression divide by zero — fall back to plain pass 3.
    val histMap = hist.toMap
    val hot =
      if (subWidth <= 0d) Seq.empty[Long]
      else targets.map(_._3).distinct.filter(histMap(_) > recurseBound)
    // per target: (q, k, b, sb, below) with sb = -1 for non-recursed
    // buckets, or Left(value) when the subbucket collapsed to one value
    val refined: Seq[Either[(Double, Double), (Double, Long, Long, Long, Long)]] =
      if (hot.isEmpty) {
        targets.map { case (q, k, b, below) => Right((q, k, b, -1L, below)) }
      } else {
        val sub = v.withColumn("b", bucket).filter(col("b").isin(hot: _*))
          .groupBy(col("b"), subBucket.as("sb"))
          .agg(count(lit(1)).as("c"), min("value").as("slo"),
            max("value").as("shi"))
          .collect()
          .map(r => r.getLong(0) ->
            (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
          .groupBy(_._1)
          .map { case (b, rows) => b -> rows.map(_._2).sortBy(_._1).toSeq }
        targets.map { case (q, k, b, below) =>
          if (!hot.contains(b)) Right((q, k, b, -1L, below))
          else {
            val rows = sub(b)
            val (sb, subBelow) = locate(rows.map(t => t._1 -> t._2), k - below)
            val (_, _, slo, shi) = rows.find(_._1 == sb).get
            if (slo == shi) Left((q, slo)) // repeated value: rank answered
            else Right((q, k, b, sb, below + subBelow))
          }
        }
      }
    val direct = refined.collect { case Left(t) => t }
    val open = refined.collect { case Right(t) => t }

    val pickedRows: Seq[(Double, Double)] =
      if (open.isEmpty) Seq.empty
      else {
        // pass 3: candidate (sub)buckets only; per-(b, sb) window picks
        // local ranks. sb = -1 marks whole-bucket candidates.
        val hotOpen = open.map(_._3).distinct.filter(hot.contains)
        val needB = open.map(_._3).distinct
        val needPairs = open.map { case (_, _, b, sb, _) => (b, sb) }.distinct
        val localRank = open.map { case (_, k, b, sb, below) =>
          ((b, sb), k - below)
        }
        val w = Window.partitionBy("b", "sb").orderBy("value")
        val picked = v.withColumn("b", bucket)
          .filter(col("b").isin(needB: _*))
          .withColumn("sb",
            if (hotOpen.isEmpty) lit(-1L)
            else when(col("b").isin(hotOpen: _*), subBucket).otherwise(lit(-1L)))
          .filter(needPairs.map { case (b, sb) =>
            col("b") === b && col("sb") === sb
          }.reduce(_ || _))
          .withColumn("rn", row_number().over(w))
          .filter(localRank.map { case ((b, sb), r) =>
            col("b") === b && col("sb") === sb && col("rn") === r
          }.reduce(_ || _))
          .select(col("b"), col("sb"), col("rn"), col("value"))
          .collect() // row_number is IntegerType — widen for the rank key
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong) ->
            r.getDouble(3)).toMap
        open.map { case (q, k, b, sb, below) =>
          (q, picked((b, sb, k - below)))
        }
      }

    (direct ++ pickedRows).toDF("quantile", "value").orderBy("quantile")
  }

  val q88Sql: String = {
    val values = Quantiles.map(q => s"($q)").mkString(",")
    s"""WITH ranked AS (
       |  SELECT value, row_number() OVER (ORDER BY value) AS rn,
       |         count(*) OVER () AS n
       |  FROM events)
       |SELECT qs.q AS quantile, r.value
       |FROM (VALUES $values) qs(q)
       |JOIN ranked r ON r.rn = CAST(floor(qs.q * (r.n - 1)) AS BIGINT) + 1
       |ORDER BY quantile""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q88_exact_quantiles" -> q88ExactQuantiles)

  val oracles: Map[String, String] = Map(
    "q88_exact_quantiles" -> q88Sql)
}
