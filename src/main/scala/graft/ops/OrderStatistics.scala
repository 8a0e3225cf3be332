package graft.ops

import graft.{Q, Tables}
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
  *   pass 3 (scan): only candidate-bucket rows survive the pushed filter;
  *     a per-bucket window row_number picks rank (k - below) inside each.
  *
  * Three cheap scans replace one full-shuffle sort. Bucket residency is
  * decided by the SAME bucket expression in pass 2 and pass 3, so float
  * boundary placement cannot disagree between the histogram and the
  * candidate filter. Skew honesty: a pathological bucket (one massively
  * repeated value) makes pass 3's window sort one bucket in one task; the
  * scale remedy is to RECURSE the histogram inside that bucket (same
  * passes, narrowed range) — single level suffices at the gated SFs and
  * the recursion changes no semantics. All-equal corpora short-circuit
  * after pass 1.
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

  val q88ExactQuantiles: Q = (s, d) => {
    import s.implicits._
    val v = Tables.events(s, d).select(col("value"))

    // pass 1: range + count
    val r0 = v.agg(min("value").as("lo"), max("value").as("hi"),
      count(lit(1)).as("n")).head
    val (lo, hi, n) = (r0.getDouble(0), r0.getDouble(1), r0.getLong(2))
    val ranks = Quantiles.map(q => math.floor(q * (n - 1)).toLong + 1L)

    if (lo == hi) { // all-equal corpus: every quantile is the value itself
      Quantiles.map(q => (q, lo)).toDF("quantile", "value")
        .orderBy("quantile")
    } else {
      // shared bucket expression (passes 2 and 3): uniform over [lo, hi],
      // top edge clamped into the last bucket
      val width = (hi - lo) / Buckets
      val bucket = least(floor((col("value") - lit(lo)) / lit(width)),
        lit(Buckets - 1L)).cast("long")

      // pass 2: histogram, collected bounded (<= B rows, data-independent)
      val hist = v.groupBy(bucket.as("b")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)

      // driver: each rank's bucket + count of values strictly below it
      val targets: Seq[(Double, Long, Long, Long)] = // (q, rank, bucket, below)
        Quantiles.zip(ranks).map { case (q, k) =>
          var cum = 0L
          var res: Option[(Long, Long)] = None
          for ((b, c) <- hist if res.isEmpty) {
            if (k <= cum + c) res = Some((b, cum))
            cum += c
          }
          val (b, below) = res.getOrElse(
            sys.error(s"rank $k beyond histogram total $cum"))
          (q, k, b, below)
        }

      // pass 3: candidate buckets only; per-bucket window picks local ranks
      val need = targets.map(_._3).distinct
      val localRank = targets.map { case (_, k, b, below) => (b, k - below) }
      val w = Window.partitionBy("b").orderBy("value")
      val picked = v.withColumn("b", bucket)
        .filter(col("b").isin(need: _*))
        .withColumn("rn", row_number().over(w))
        .filter(localRank.map { case (b, r) =>
          col("b") === b && col("rn") === r
        }.reduce(_ || _))
        .select(col("b"), col("rn"), col("value"))
        .collect() // row_number is IntegerType — widen for the (b, rank) key
        .map(r => (r.getLong(0), r.getInt(1).toLong) -> r.getDouble(2)).toMap

      targets.map { case (q, k, b, below) => (q, picked((b, k - below))) }
        .toDF("quantile", "value")
        .orderBy("quantile")
    }
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
