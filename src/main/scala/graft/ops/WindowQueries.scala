package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (SURVEY.md §2.5) over the `events` stream table.
  *
  * The reference's richest single query is `get_tick_features`
  * (`src/services/event_store/duckdb.py:408-458`): LAG deltas, pct change
  * with NULLIF guard, rolling 5/10-tick STDDEV frames, running MAX, and
  * drawdown — all over one shared named WINDOW ordered by seq. Here the
  * analog keys are user_id≈game_id, event_id≈seq, value≈price.
  *
  * Scale note (SURVEY §7.4-7): reference windows are globally ordered because
  * its queries are single-game; we ALWAYS partition windows by the entity key
  * so the sort is per-partition — no single-reducer global sort at 100 TB.
  *
  * Determinism: lag/delta/ratio/max/row_number are exact float ops (same bits
  * in Spark and DuckDB); only rolling STDDEV accumulates in engine-specific
  * order (Spark recomputes per frame, DuckDB uses a segment tree) ⇒ rounded.
  */
object WindowQueries {

  private val wOrd = Window.partitionBy("user_id").orderBy("event_id")

  // ---------------------------------------------------------------------------
  // q21 — LAG + delta + pct-change with NULLIF guard (W1): `duckdb.py:437-439`.
  val q21Lag: Q = (s, d) => {
    val prev = lag(col("value"), 1).over(wOrd)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("value"),
        (col("value") - prev).as("delta"),
        (col("value") - prev).divide(when(prev === 0, null).otherwise(prev))
          .as("pct_change"))
      // no barrier here (r17, measured): the sort-sampling re-execution
      // is real but LAG is a trivial frame -- persisting 100k rows cost
      // more than recomputing it (0.45 -> 0.61 s); contrast q22/q25,
      // whose stddev/struct-max frames earn the barrier
      .orderBy("event_id")
  }
  val q21Sql: String =
    """SELECT event_id, user_id, value,
      |  value - lag(value) OVER w AS delta,
      |  (value - lag(value) OVER w) / nullif(lag(value) OVER w, 0) AS pct_change
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------------
  // q22 — rolling STDDEV frames (W2): 5- and 10-tick volatility
  // (`duckdb.py:440-445`). Guarded to NULL below 2 rows (Spark yields NaN,
  // DuckDB NULL); rounded 3dp (segment-tree vs per-frame accumulation).
  val q22RollingStd: Q = (s, d) => {
    val w5 = wOrd.rowsBetween(-4, 0)
    val w10 = wOrd.rowsBetween(-9, 0)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("value"),
        when(count(lit(1)).over(w5) >= 2, round(stddev(col("value")).over(w5), 3))
          .as("vol_5"),
        when(count(lit(1)).over(w10) >= 2, round(stddev(col("value")).over(w10), 3))
          .as("vol_10"))
      // lazy barrier before the total-order tail (r17, the q32/q33 fix
      // lifted to the expensive windows): range partitioning's sampling
      // pass re-executes the sort's child, so sorting directly over the
      // window projection ran the two stddev frames TWICE (measured
      // 1.01 -> 0.75 s, 5-rep min); the checkpoint materializes the slim
      // result rows once, inside the sampling job itself (eager=false).
      // q21/q23/q24's trivial frames measured cheaper WITHOUT a barrier.
      .localCheckpoint(eager = false)
      .orderBy("event_id")
  }
  val q22Sql: String =
    """SELECT event_id, user_id, value,
      |  CASE WHEN count(*) OVER w5 >= 2 THEN round(stddev_samp(value) OVER w5, 3) END AS vol_5,
      |  CASE WHEN count(*) OVER w10 >= 2 THEN round(stddev_samp(value) OVER w10, 3) END AS vol_10
      |FROM events
      |WINDOW w5 AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
      |       w10 AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------------
  // q23 — running MAX + drawdown (W3/W4): `duckdb.py:446-452`
  // price / NULLIF(running_max, 0) - 1. Comparisons only ⇒ exact.
  val q23RunningMax: Q = (s, d) => {
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    val runMax = max(col("value")).over(wRun)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("value"),
        runMax.as("running_max"),
        (col("value").divide(when(runMax === 0, null).otherwise(runMax)) - 1)
          .as("drawdown"))
      .orderBy("event_id")
  }
  val q23Sql: String =
    """SELECT event_id, user_id, value,
      |  max(value) OVER w AS running_max,
      |  value / nullif(max(value) OVER w, 0) - 1 AS drawdown
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------------
  // q24 — ROW_NUMBER dedup-best-row (A6/W6): keep one row per key by a total
  // tie-broken order (`build_scalping_dataset.py:50-74`:
  // PARTITION BY game_id ORDER BY price_len DESC, date DESC, ts DESC ... rn=1).
  val q24DedupBest: Q = (s, d) => {
    val w = Window.partitionBy("user_id")
      .orderBy(desc("value"), desc("ts"), asc("event_id"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "value")
      .orderBy("user_id")
  }
  val q24Sql: String =
    """SELECT user_id, event_id, value FROM (
      |  SELECT user_id, event_id, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, ts DESC, event_id ASC) AS rn
      |  FROM events) WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------------
  // q25 — running peak + ticks-since-peak (W8): RL observation features
  // (`sidebet_v1_env.py:92-99`) — running max + index of the peak via the
  // struct-max trick (max_by over the running frame), distance since peak.
  /** q25's windowed projection WITHOUT the total-order tail — factored
    * out so PlanSpec can assert the window shape (the barrier below
    * truncates lineage, hiding the WindowExec from the final plan; the
    * q80Scores precedent).
    */
  private[graft] def q25Features(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    val rnAll = row_number().over(wOrd)
    Tables.events(s, d)
      .withColumn("rn", rnAll)
      .withColumn("running_peak", max(col("value")).over(wRun))
      .withColumn("peak_rn",
        (max(struct(col("value"), (-col("rn")).as("neg_rn"))).over(wRun)("neg_rn") * -1)
          .cast("long"))
      .withColumn("rows_since_peak", (col("rn") - col("peak_rn")).cast("long"))
      .select("event_id", "user_id", "value", "running_peak", "peak_rn", "rows_since_peak")
  }
  val q25PeakTracking: Q = (s, d) =>
    q25Features(s, d)
      .localCheckpoint(eager = false) // see q22: the double struct-max frame earns the barrier (0.61 -> 0.48 s)
      .orderBy("event_id")
  // max(struct(value, -rn)) picks the EARLIEST row among equal peaks —
  // "first time the current peak was reached". SQL form: a row is a NEW
  // HIGH iff its value strictly exceeds the prior running max; the last
  // new-high row in the prefix is exactly the first occurrence of the
  // current running peak (later equal values are not new highs).
  val q25Sql: String =
    """WITH base AS (
      |  SELECT event_id, user_id, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
      |    max(value) OVER (PARTITION BY user_id ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_peak,
      |    CASE WHEN value > coalesce(max(value) OVER (PARTITION BY user_id ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1e308) THEN 1 ELSE 0 END AS is_new_high
      |  FROM events)
      |SELECT event_id, user_id, value, running_peak,
      |  max(CASE WHEN is_new_high = 1 THEN rn END) OVER (PARTITION BY user_id ORDER BY rn
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak_rn,
      |  rn - max(CASE WHEN is_new_high = 1 THEN rn END) OVER (PARTITION BY user_id ORDER BY rn
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rows_since_peak
      |FROM base ORDER BY event_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q21_window_lag" -> q21Lag,
    "q22_rolling_stddev" -> q22RollingStd,
    "q23_running_max_drawdown" -> q23RunningMax,
    "q24_dedup_best_row" -> q24DedupBest,
    "q25_peak_tracking" -> q25PeakTracking)

  val oracles: Map[String, String] = Map(
    "q21_window_lag" -> q21Sql,
    "q22_rolling_stddev" -> q22Sql,
    "q23_running_max_drawdown" -> q23Sql,
    "q24_dedup_best_row" -> q24Sql,
    "q25_peak_tracking" -> q25Sql)
}
