package graft.domain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D1/D2 (SURVEY §2.10): the per-tick ML feature vector
  * (`src/ml/feature_extractor.py:36-314`, `src/rl/envs/sidebet_v1_env.py:
  * 33-135`) re-expressed as ONE window-expression pipeline — no per-tick
  * Python loop, no UDF: every feature is a column over the (game, tick)
  * frame family, so the whole vector computes in a single per-game sort
  * inside whole-stage codegen.
  *
  * Input: per-tick rows (game_id, tick, price). Output: input + 12 feature
  * columns. Where the reference keeps mutable per-game state (spike history,
  * cooldown), the equivalent window is annotated.
  */
object FeatureExtractor {

  val SpikeThreshold = 0.10   // feature_extractor.py spike definition
  val SpikeWindow = 50        // spike frequency lookback
  val CooldownTicks = 5       // sidebet cooldown (explorer_data.py:21-24)

  def tickFeatures(ticks: DataFrame): DataFrame = {
    val wg = Window.partitionBy("game_id") // whole-game frame
    val w = Window.partitionBy("game_id").orderBy("tick")
    val wRun = w.rowsBetween(Window.unboundedPreceding, 0)
    val w5 = w.rowsBetween(-4, 0)
    val w20 = w.rowsBetween(-19, 0)
    val w50 = w.rowsBetween(-(SpikeWindow - 1), 0)

    val p = col("price")
    val prev = lag(p, 1).over(w)
    val ret = when(prev > 0, p / prev - 1)
    val delta = p - prev
    val rn = row_number().over(w)
    val vol5 = stddev(p).over(w5)
    val vol20 = stddev(p).over(w20)
    val q1 = expr("percentile(price, 0.25)").over(wg)
    val q3 = expr("percentile(price, 0.75)").over(wg)
    val runPeak = max(p).over(wRun)
    val peakRn = max(struct(p, (-rn).as("neg_rn"))).over(wRun)("neg_rn") * -1

    ticks
      .withColumn("ret", ret)
      .withColumn("rn", rn)
      .withColumn("is_spike", (abs(col("ret")) > SpikeThreshold).cast("int"))
      // 1. position in the game's lifetime (tick percentile); a single-tick
      // game at tick 0 (instarug) has max(tick)=0 — guard like every other
      // ratio here (ANSI errors on 0/0)
      .withColumn("tick_percentile",
        when(max(col("tick")).over(wg) > 0,
          col("tick") / max(col("tick")).over(wg)).otherwise(0.0))
      // 2. z-score vs the whole game's distribution
      .withColumn("price_zscore",
        when(stddev(p).over(wg) > 0, (p - avg(p).over(wg)) / stddev(p).over(wg)))
      // 3. IQR position
      .withColumn("iqr_position", when(q3 > q1, (p - q1) / (q3 - q1)))
      // 4. short/long volatility ratio
      .withColumn("vol_ratio", when(vol20 > 0, vol5 / vol20))
      // 5. momentum over 5 ticks
      .withColumn("momentum_5", p - lag(p, 5).over(w))
      // 6. acceleration (second difference)
      .withColumn("acceleration", delta - lag(delta, 1).over(w))
      // 7. volatility intensity vs the game's average short vol
      .withColumn("vol_intensity",
        when(avg(vol5).over(wg) > 0, vol5 / avg(vol5).over(wg)))
      // 8. spike frequency in the last 50 ticks (reference: spike history list)
      .withColumn("spike_frequency",
        sum(col("is_spike")).over(w50) / least(col("rn"), lit(SpikeWindow)))
      // 9. spike spacing: ticks since the last spike (reference: mutable state)
      .withColumn("ticks_since_spike",
        col("rn") - max(when(col("is_spike") === 1, col("rn"))).over(wRun))
      // 10. death-spike score: worst 3-tick drop normalized by long vol
      .withColumn("death_spike_score",
        when(vol20 > 0, greatest(lit(0.0), (lag(p, 3).over(w) - p)) / vol20))
      // 11/12. running-peak observations (D2)
      .withColumn("drawdown_from_peak", when(runPeak > 0, p / runPeak - 1))
      .withColumn("ticks_since_peak", (col("rn") - peakRn).cast("long"))
      // 13. cooldown status: inside the post-spike sidebet cooldown?
      .withColumn("in_cooldown",
        coalesce(col("ticks_since_spike") <= CooldownTicks, lit(false)))
      .drop("rn", "is_spike")
  }
}
