package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain analytics over `complete_game` documents: dedup, flattening,
  * labeling, volatility — the reference's batch-ETL layer that produces the
  * derived tables of SURVEY §1.3 (games_with_prices, games_deduplicated,
  * sidebets_deduplicated, volatility_metrics).
  *
  * Everything here is pure column expressions / higher-order array functions
  * over the `prices: array<double>` series — no explode of 100 TB of ticks
  * unless an operator genuinely needs per-tick rows.
  */
object GameAnalytics {

  // Sidebet economics (explorer_data.py:21-24, training_data/README.md):
  val SidebetWindowTicks = 40
  val SidebetCooldownTicks = 5
  val SidebetPayout = 5.0
  val OptimalZoneStartTick = 200
  val UnplayableBelowTicks = 40

  /** games_with_prices (§1.3): per-game scalar features derived from the
    * parsed complete_game document. peak/final/duration via array higher-order
    * fns; peak_tick = first index attaining the max (array_position on the
    * max value — exact double equality is safe because it's the same element).
    */
  def gamesWithPrices(games: DataFrame): DataFrame = {
    val prices = col("game.prices")
    games.select(
      col("game.id").as("game_id"),
      col("game.timestamp").as("timestamp"),
      size(prices).as("duration_ticks"),
      prices.as("prices"),
      col("game.peakMultiplier").as("peak_multiplier"),
      (array_position(prices, array_max(prices)) - 1).cast("int").as("peak_tick"),
      (size(prices) - array_position(prices, array_max(prices))).cast("int")
        .as("ticks_after_peak"),
      element_at(prices, -1).as("final_price"),
      (size(prices) < UnplayableBelowTicks).as("is_unplayable"),
      col("game.gameVersion").as("game_version"),
      col("game.rugged").as("rugged"),
      col("game.globalSidebets").as("sidebets"))
  }

  /** games_deduplicated (A6/A7 + §1.3): the reference's raw feed re-emits each
    * game ~10× (rolling 10-game history window) plus a dual rug emission;
    * dedup keeps the best row per game_id by an explicit total order
    * (price_len DESC, ts DESC — `build_scalping_dataset.py:50-74`), NOT
    * keep-first (file-order dependent, non-deterministic under parallel scan;
    * documented deviation per SURVEY §7.4-2).
    */
  def dedupGames(gamesWithPrices: DataFrame): DataFrame = {
    val w = Window.partitionBy("game_id")
      .orderBy(desc("duration_ticks"), desc("timestamp"))
    gamesWithPrices
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Rug tick (D5): index of the largest single-tick drop in `prices`
    * (`analyze_rug_mechanism.py:36-44`) — zip_with consecutive deltas, then
    * argmax via a (drop, -idx) struct max: earliest tick wins ties.
    */
  def withRugTick(df: DataFrame, pricesCol: String = "prices"): DataFrame = {
    val p = col(pricesCol)
    val drops = zip_with(slice(p, lit(1), size(p) - 1), slice(p, lit(2), size(p) - 1),
      (prev, cur) => prev - cur)
    val best = aggregate(
      zip_with(drops, sequence(lit(1), size(p) - 1),
        (d, i) => struct(d.as("drop"), (-i).as("neg_idx"))),
      struct(lit(Double.MinValue).as("drop"), lit(0).as("neg_idx")),
      (acc, x) => when(x("drop") > acc("drop"), x).otherwise(acc))
    df.withColumn("rug_tick", when(size(p) >= 2, (-best("neg_idx")).cast("int")))
      .withColumn("rug_drop",
        when(size(p) >= 2, best("drop")))
  }

  /** sidebets_deduplicated (J4 + D4 + §1.3): unnest `globalSidebets[]` to one
    * row per bet carrying parent-game context (the nested-array join), then
    * label: win iff start_tick <= rug_tick <= start_tick + 39; 5:1 payout;
    * near-miss = lost by <= 5 ticks; optimal zone = start_tick >= 200
    * (explorer_data.py:21-24,105-135).
    */
  def sidebetsLabeled(dedupedGames: DataFrame): DataFrame = {
    val withRug = withRugTick(dedupedGames)
    withRug
      .select(col("game_id"), col("duration_ticks").as("game_duration"),
        col("timestamp"), col("rug_tick"),
        explode(col("sidebets")).as("sb"))
      .select(
        col("game_id"), col("game_duration"), col("timestamp"), col("rug_tick"),
        col("sb.playerId").as("player_id"),
        col("sb.username").as("username"),
        col("sb.betAmount").as("bet_amount"),
        col("sb.xPayout").as("x_payout"),
        col("sb.startedAtTick").as("start_tick"),
        (col("sb.startedAtTick") + SidebetWindowTicks).as("end_tick"),
        col("sb.type").as("type"))
      .withColumn("bet_won",
        col("rug_tick").isNotNull &&
          col("rug_tick") >= col("start_tick") &&
          col("rug_tick") <= col("start_tick") + (SidebetWindowTicks - 1))
      .withColumn("ticks_to_rug", col("rug_tick") - col("start_tick"))
      .withColumn("was_near_miss",
        !col("bet_won") && col("ticks_to_rug").isNotNull &&
          col("ticks_to_rug") > (SidebetWindowTicks - 1) &&
          col("ticks_to_rug") <= (SidebetWindowTicks - 1) + SidebetCooldownTicks)
      .withColumn("bet_in_optimal_zone", col("start_tick") >= OptimalZoneStartTick)
      .withColumn("payout",
        when(col("bet_won"), col("bet_amount") * SidebetPayout)
          .otherwise(-col("bet_amount")))
  }

  /** Win-rate by entry-tick bucket (A13, training_data/README.md table). */
  def winRateByEntryBucket(sidebets: DataFrame, bucketWidth: Int = 50): DataFrame =
    sidebets
      .groupBy((floor(col("start_tick") / bucketWidth) * bucketWidth).cast("int")
        .as("entry_bucket"))
      .agg(count(lit(1)).as("n_bets"),
        avg(col("bet_won").cast("double")).as("win_rate"))
      .orderBy("entry_bucket")

  /** volatility_metrics (A15/D3, `volatility_study.py:53-137`): per-game
    * array aggregation — price/return/log-return stddev, range, spikes,
    * vol-of-vol — computed with higher-order functions on the prices array
    * (single pass per game, no shuffle: the array is already game-local).
    *
    * stddev here is population-consistent with numpy's default ddof=0?
    * No — the study uses np.std() (ddof=0, population). We therefore compute
    * POPULATION stddev explicitly via aggregate(), documented deviation from
    * SQL STDDEV (sample).
    */
  /** Vol-of-vol window width (W7, `volatility_study.py:114-118`): pandas
    * `Series(returns).rolling(10).std()` — SAMPLE std over each full 10-value
    * window (shorter prefixes are NaN and dropped) — then POPULATION std of
    * that rolling series; 0.0 when fewer than 20 returns exist.
    */
  val VolOfVolWindow = 10
  val VolOfVolMinReturns = 20

  def volatilityMetrics(dedupedGames: DataFrame): DataFrame = {
    val p = col("prices")
    def mean(arr: Column): Column =
      aggregate(arr, lit(0.0), (a, x) => a + x) / size(arr)
    def popStd(arr: Column): Column = {
      val m = mean(arr)
      sqrt(aggregate(arr, lit(0.0), (a, x) => a + (x - m) * (x - m)) / size(arr))
    }
    // ONE-pass (sum, sum-of-squares) fold — the shared kernel for every
    // std over a derived array: the mean-centered form would re-evaluate
    // the inner mean aggregate (and the array-building expression under
    // it) once per element, the O(n·w²)+ HOF-inlining pitfall.
    def sumSq(arr: Column): Column = aggregate(arr,
      struct(lit(0.0).as("s"), lit(0.0).as("s2")),
      (a, x) => struct((a("s") + x).as("s"), (a("s2") + x * x).as("s2")))
    // Sample std of a fixed-width slice; greatest() clamps the
    // cancellation residue of identical-value windows to 0.
    def sampleStdSlice(sl: Column): Column = {
      val acc = sumSq(sl)
      val n = size(sl).cast("double")
      sqrt(greatest(
        (acc("s2") - acc("s") * acc("s") / n) / (n - lit(1.0)), lit(0.0)))
    }
    val rets = zip_with(slice(p, lit(2), size(p) - 1), slice(p, lit(1), size(p) - 1),
      (cur, prev) => (cur - prev) / prev)
    val logRets = zip_with(slice(p, lit(2), size(p) - 1), slice(p, lit(1), size(p) - 1),
      (cur, prev) => log(cur / prev))
    val spikes = filter(rets, r => abs(r) > lit(0.10))
    // W7 vol-of-vol: rolling sample std over every full 10-return window
    // (1-based slice start i-9 for window ending at return i), then
    // population std of the rolling series. Gated exactly like the study:
    // fewer than 20 returns => 0.0.
    val nRets = size(rets)
    val rollingVols = transform(
      sequence(lit(VolOfVolWindow), nRets),
      i => sampleStdSlice(slice(rets, i - lit(VolOfVolWindow - 1), lit(VolOfVolWindow))))
    // population std of the ROLLING series via the same one-pass fold,
    // window count derived arithmetically (size(rollingVols) would
    // re-evaluate the whole O(n·w) rolling build a second time)
    val volOfVol = {
      val acc = sumSq(rollingVols)
      val nWin = (nRets - lit(VolOfVolWindow - 1)).cast("double")
      val m = acc("s") / nWin
      sqrt(greatest(acc("s2") / nWin - m * m, lit(0.0)))
    }
    dedupedGames
      .filter(size(p) >= 2)
      .select(
        col("game_id"),
        size(p).as("duration_ticks"),
        popStd(p).as("price_std"),
        popStd(rets).as("return_std"),
        popStd(logRets).as("log_return_std"),
        (array_max(p) - array_min(p)).as("price_range"),
        // NULL (not an ANSI /0 error) if a malformed game contains price 0
        when(array_min(p) > 0, array_max(p) / array_min(p)).as("high_low_ratio"),
        size(spikes).as("spike_count"),
        when(size(spikes) > 0, array_max(transform(spikes, r => abs(r))))
          .as("max_spike_magnitude"),
        when(size(spikes) > 0, mean(transform(spikes, r => abs(r))))
          .as("avg_spike_magnitude"),
        // guard keeps sequence() ascending: below 20 returns the rolling
        // series is never built (sequence(10, n<10) would run DESCENDING)
        when(nRets >= VolOfVolMinReturns, volOfVol).otherwise(0.0)
          .as("vol_of_vol"),
        col("peak_multiplier"),
        element_at(p, -1).as("final_price"),
        (size(p) >= OptimalZoneStartTick).as("is_profitable_sidebet_zone"))
  }

  /** Pre-rug window association (J5, `analyze_pre_rug_events.py:68-98`):
    * bucket events into [-5s, +2s] around each rug timestamp and count per
    * (bucket, event_name) — the range join + floor-bucket + count-map shape.
    */
  def preRugEventBuckets(envelopes: DataFrame, rugs: DataFrame): DataFrame = {
    val ev = envelopes.select(col("event_name"),
      to_timestamp(col("ts")).as("ev_ts"))
    val rg = rugs.select(col("game_id"), to_timestamp(col("rug_ts")).as("rug_ts"))
    ev.join(broadcast(rg),
        col("ev_ts") >= col("rug_ts") - expr("INTERVAL 5 SECONDS") &&
          col("ev_ts") <= col("rug_ts") + expr("INTERVAL 2 SECONDS"))
      .withColumn("bucket_s",
        floor((unix_micros(col("ev_ts")) - unix_micros(col("rug_ts"))) / 1e6).cast("int"))
      .groupBy("bucket_s", "event_name")
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket_s", "event_name")
  }
}
