package graft.domain

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** D3 (SURVEY §2.10, §7.3): per-game volatility metrics as a typed
  * `Aggregator[TickRow, Buf, VolatilityMetrics]` — the reusable single-pass
  * form of `volatility_study.py:53-137`, for callers that have per-tick ROWS
  * (the event store) rather than a per-game `prices` array (where
  * `GameAnalytics.volatilityMetrics`'s higher-order-function form applies).
  *
  * Return-based metrics depend on tick ORDER, and aggregation buffers see
  * rows in arbitrary partition order — so the buffer accumulates compact
  * (tick, price) pairs and `finish` sorts once and computes everything in a
  * single pass. Game episodes are bounded (reference corpus max 1,815 ticks,
  * BASELINE.md), so the buffer stays small; the aggregation itself is
  * map-side combinable and shuffles only the per-game buffers.
  */
object VolatilityAggregator {

  final case class TickRow(game_id: String, tick: Int, price: Double)

  final case class VolatilityMetrics(
      duration_ticks: Int,
      price_std: Double,
      return_std: Double,
      log_return_std: Double,
      price_range: Double,
      high_low_ratio: Double,
      spike_count: Int,
      max_spike_magnitude: Double,
      avg_spike_magnitude: Double,
      vol_of_vol: Double,
      final_price: Double)

  val SpikeThreshold = 0.10 // |return| > 10% (volatility_study.py:98-104)

  private def popStd(xs: Seq[Double]): Double = {
    if (xs.isEmpty) return Double.NaN
    val m = xs.sum / xs.size
    math.sqrt(xs.map(x => (x - m) * (x - m)).sum / xs.size)
  }

  private def sampleStd(xs: Seq[Double]): Double = {
    val m = xs.sum / xs.size
    math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1))
  }

  /** W7 vol-of-vol (`volatility_study.py:114-118`): pandas rolling(10).std()
    * — SAMPLE std of every full 10-return window — then POPULATION std of
    * the rolling series; 0.0 below 20 returns.
    */
  def volOfVol(rets: IndexedSeq[Double]): Double =
    if (rets.size < GameAnalytics.VolOfVolMinReturns) 0.0
    else popStd((GameAnalytics.VolOfVolWindow to rets.size)
      .map(i => sampleStd(rets.slice(i - GameAnalytics.VolOfVolWindow, i))))

  /** Compute the metrics from an ORDERED price series (shared by the
    * aggregator's finish and by tests comparing against the array form).
    */
  def fromPrices(prices: IndexedSeq[Double]): VolatilityMetrics = {
    val rets = prices.sliding(2).collect {
      case IndexedSeq(a, b) if a > 0 => b / a - 1
    }.toVector
    val logRets = prices.sliding(2).collect {
      case IndexedSeq(a, b) if a > 0 && b > 0 => math.log(b / a)
    }.toVector
    val spikes = rets.filter(r => math.abs(r) > SpikeThreshold).map(math.abs)
    VolatilityMetrics(
      duration_ticks = prices.size,
      price_std = popStd(prices),
      return_std = popStd(rets),
      log_return_std = popStd(logRets),
      price_range = prices.max - prices.min,
      high_low_ratio = if (prices.min > 0) prices.max / prices.min else Double.NaN,
      spike_count = spikes.size,
      // 0.0 (not NaN) when spike-free: keeps case-class equality usable
      max_spike_magnitude = if (spikes.nonEmpty) spikes.max else 0.0,
      avg_spike_magnitude =
        if (spikes.nonEmpty) spikes.sum / spikes.size else 0.0,
      vol_of_vol = volOfVol(rets),
      final_price = prices.last)
  }

  /** Ceiling on buffered ticks per game: ~50× the longest episode ever
    * observed (1,815 ticks, BASELINE.md). A group past it is malformed
    * input (e.g. a join exploded the key), and failing fast with a
    * diagnosable message beats silently growing a per-group buffer until
    * an executor OOMs mid-shuffle.
    */
  val MaxTicksPerGame = 100000

  class Agg(maxTicks: Int = MaxTicksPerGame)
      extends Aggregator[TickRow, ArrayBuffer[(Int, Double)], VolatilityMetrics] {
    override def zero: ArrayBuffer[(Int, Double)] = ArrayBuffer.empty

    private def checked(b: ArrayBuffer[(Int, Double)]): ArrayBuffer[(Int, Double)] = {
      if (b.size > maxTicks) throw new IllegalStateException(
        s"VolatilityAggregator buffered ${b.size} ticks for one game " +
          s"(cap $maxTicks): episodes are bounded (~2k ticks) — is the " +
          "grouping key wrong or a join exploding rows?")
      b
    }

    override def reduce(b: ArrayBuffer[(Int, Double)], t: TickRow): ArrayBuffer[(Int, Double)] = {
      b += ((t.tick, t.price)); checked(b)
    }

    override def merge(a: ArrayBuffer[(Int, Double)],
        b: ArrayBuffer[(Int, Double)]): ArrayBuffer[(Int, Double)] = { a ++= b; checked(a) }

    override def finish(b: ArrayBuffer[(Int, Double)]): VolatilityMetrics =
      fromPrices(b.sortBy(_._1).map(_._2).toIndexedSeq)

    override def bufferEncoder: Encoder[ArrayBuffer[(Int, Double)]] =
      Encoders.kryo[ArrayBuffer[(Int, Double)]]

    override def outputEncoder: Encoder[VolatilityMetrics] =
      Encoders.product[VolatilityMetrics]
  }
}
