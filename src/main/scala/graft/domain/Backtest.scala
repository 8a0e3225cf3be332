package graft.domain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backtesting (D8/D9 + A16): evaluate a sidebet strategy over recorded
  * games and fold per-bet PnL into an equity curve.
  *
  * The reference replays each game in a Python tick loop
  * (`backtest_service.py:358-572`). Re-expressed Spark-first:
  *   - bet outcomes are PURE COLUMN EXPRESSIONS (D4 — win iff the rug tick
  *     falls in [start, start+39]; the whole bet schedule is computable from
  *     (entry, duration), no per-tick iteration);
  *   - the compounding wallet across an ordered game sequence — inherently a
  *     sequential product — becomes a WINDOW CUMULATIVE SUM IN LOG SPACE:
  *     bankroll_t = b0·∏(1+r_i) = b0·exp(Σ log1p(r_i)), turning the
  *     reference's driver-side fold into a distributed prefix aggregation;
  *   - train/validation split by md5 hash (D9, `backtest_service.py:262-265`)
  *     — bit-exact reproducible.
  */
object Backtest {

  /** Martingale-style multi-bet schedule: bet i (1-based) enters at
    * entry + (i-1)·45 with stake · 2^(i-1) (`explorer_data.py:105-135`,
    * `position_sizing.py:171-196`): first bet whose window contains the rug
    * tick wins (correlated as-of lookup J6 — expressed as array logic).
    */
  def evaluateStrategy(
      gamesWithRug: DataFrame,
      entryTick: Int,
      maxBets: Int,
      baseBetFrac: Double): DataFrame = {
    val schedule = (1 to maxBets).map { i =>
      struct(
        lit(entryTick + (i - 1) * 45).as("start_tick"),
        lit(baseBetFrac * math.pow(2, i - 1)).as("stake"))
    }
    val bets = array(schedule: _*)
    // first bet (lowest start) whose [start, start+39] window contains the
    // rug tick AND that was actually placeable (the game must last past the
    // bet's start tick — a bet never placed cannot pay out)
    val winning = filter(bets, b =>
      col("duration_ticks") > b("start_tick") &&
        col("rug_tick") >= b("start_tick") &&
        col("rug_tick") <= b("start_tick") + (GameAnalytics.SidebetWindowTicks - 1))
    // a martingale stops after its first win: a bet is placed only if the
    // game lasted past its start AND no earlier bet in the schedule won.
    // Guarded element_at: ANSI mode errors on index 1 of an empty array.
    val winStart = when(size(winning) > 0, element_at(winning, 1)("start_tick"))
      .otherwise(lit(Int.MaxValue))
    val placed = filter(bets, b =>
      col("duration_ticks") > b("start_tick") && b("start_tick") <= winStart)
    val stakeLost = aggregate(placed, lit(0.0), (a, b) => a + b("stake"))
    val stakeWon = when(size(winning) > 0,
      element_at(winning, 1)("stake") * (GameAnalytics.SidebetPayout + 1))
      .otherwise(0.0)
    gamesWithRug
      .withColumn("n_bets_placed", size(placed))
      .withColumn("pnl", stakeWon - stakeLost)
      .withColumn("won", size(winning) > 0)
  }

  /** Deterministic 30% validation split (D9): the shared md5-prefix bucket
    * (graft.hashBucket01 — same expression the q18 oracle checks).
    */
  def withSplit(df: DataFrame, validationFrac: Double = 0.30): DataFrame =
    df.withColumn("hash01", graft.hashBucket01(col("game_id")))
      .withColumn("split",
        when(col("hash01") < validationFrac, "validation").otherwise("train"))
      .drop("hash01")

  /** Equity curve over games ordered by timestamp: cumulative compounded
    * bankroll + running peak + drawdown (A16 session metrics).
    * pnl is a FRACTION of bankroll per game (fractional staking).
    *
    * Partitioning: a SINGLE portfolio's curve is an inherently sequential
    * fold over its own ordered games, and one session is bounded (~10³–10⁴
    * games, BASELINE.md) — so the unpartitioned window is a bounded
    * single-partition sort, not a 100 TB hazard. What scales is the NUMBER
    * of curves: sweeping strategies/splits/cohorts means one independent
    * curve per key, and `partitionCols` makes each a window partition —
    * N curves compute in parallel with no cross-key traffic (the q46
    * per-user form of the same shape). Callers folding a giant multi-year
    * single curve should bucket time into `partitionCols` and stitch
    * offsets — not ask one window to sort the world.
    */
  def equityCurve(perGamePnl: DataFrame, startingBankroll: Double = 1.0,
      partitionCols: Seq[String] = Nil): DataFrame = {
    val base = if (partitionCols.isEmpty) Window.orderBy("timestamp", "game_id")
      else Window.partitionBy(partitionCols.map(col): _*)
        .orderBy("timestamp", "game_id")
    val w = base.rowsBetween(Window.unboundedPreceding, 0)
    val bankroll = lit(startingBankroll) *
      exp(sum(log(greatest(lit(1e-12), lit(1.0) + col("pnl")))).over(w))
    val peak = max(bankroll).over(w)
    perGamePnl
      .withColumn("bankroll", bankroll)
      .withColumn("peak", peak)
      .withColumn("drawdown", lit(1.0) - col("bankroll") / col("peak"))
  }

  /** Session metrics (A16, `game_state.py:1003-1042`): totals, win rate,
    * avg win/loss, ROI, max drawdown.
    */
  def sessionMetrics(equity: DataFrame): DataFrame =
    equity.agg(
      count(lit(1)).as("n_games"),
      sum(when(col("won"), 1).otherwise(0)).as("n_wins"),
      avg(col("won").cast("double")).as("win_rate"),
      avg(when(col("pnl") > 0, col("pnl"))).as("avg_win"),
      avg(when(col("pnl") < 0, col("pnl"))).as("avg_loss"),
      max("drawdown").as("max_drawdown"),
      // last() is partition-order dependent; take the bankroll at the max
      // ordering key so the result is deterministic on any partitioning
      max_by(col("bankroll"), struct(col("timestamp"), col("game_id")))
        .as("final_bankroll"))
}
