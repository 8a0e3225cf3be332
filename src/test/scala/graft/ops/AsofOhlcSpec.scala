package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge semantics of the as-of join (q67) and OHLC bars (q68) that the
  * oracle's corpus can't isolate: tie timestamps, missing matches, and
  * open/close tie-breaks.
  */
class AsofOhlcSpec extends SparkSpec {

  import spark.implicits._

  private def events(dir: String,
      rows: (Long, String, Long, String, Double)*): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts")))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("q67 as-of: latest prior quote wins; equal ts matches; no quote -> NULL") {
    val dir = java.nio.file.Files.createTempDirectory("graft-asof").toString
    events(dir,
      // user 1: quotes at 10:00 and 10:05; trades at 10:03 and 10:05
      (1L, "2024-01-01 10:00:00", 1L, "view", 5.0),
      (2L, "2024-01-01 10:05:00", 1L, "view", 7.0),
      (3L, "2024-01-01 10:03:00", 1L, "purchase", 100.0),
      (4L, "2024-01-01 10:05:00", 1L, "purchase", 200.0), // ties quote 2
      // user 2: trade BEFORE any quote
      (5L, "2024-01-01 09:00:00", 2L, "purchase", 300.0),
      (6L, "2024-01-01 09:30:00", 2L, "view", 9.0))
    val got = EventQueries.q67AsofJoin(spark, dir).collect()
      .map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Long]("quote_id")).map(_.toLong)).toMap
    assert(got(3L) === Some(1L)) // 10:03 sees the 10:00 quote, not 10:05
    assert(got(4L) === Some(2L)) // equal ts: <= semantics include the quote
    assert(got(5L) === None)     // left join: no prior quote -> NULL row kept
  }

  test("q68 ohlc: open/close by (ts, event_id) order; high/low over the bar") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ohlc").toString
    events(dir,
      (10L, "2024-01-01 10:00:01", 1L, "click", 3.0),
      (11L, "2024-01-01 10:59:59", 2L, "click", 8.0),
      (12L, "2024-01-01 10:30:00", 3L, "click", 1.0),
      (13L, "2024-01-01 10:30:00", 4L, "click", 6.0), // ts tie: event_id breaks
      (14L, "2024-01-01 11:00:00", 1L, "click", 4.0)) // next bar
    val bars = EventQueries.q68OhlcBars(spark, dir).collect()
      .map(r => r.getAs[java.sql.Timestamp]("bucket").toString -> r).toMap
    val b10 = bars("2024-01-01 10:00:00.0")
    assert(b10.getAs[Double]("open") === 3.0)
    assert(b10.getAs[Double]("close") === 8.0)
    assert(b10.getAs[Double]("high") === 8.0)
    assert(b10.getAs[Double]("low") === 1.0)
    assert(b10.getAs[Long]("n_events") === 4L)
    assert(bars("2024-01-01 11:00:00.0").getAs[Double]("open") === 4.0)
  }
}
