package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeatureExtractorSpec extends SparkSpec {

  import spark.implicits._

  // g1: ramp to a peak at tick 5, crash at tick 6 (a "death spike"), recover
  private val g1 = Vector(1.0, 1.02, 1.05, 1.3, 1.6, 2.0, 0.8, 0.82, 0.85, 0.9)

  private lazy val ticks =
    g1.zipWithIndex.map { case (p, i) => ("g1", i, p) } ++
      Vector(1.0, 1.01, 1.02).zipWithIndex.map { case (p, i) => ("g2", i, p) }

  private lazy val feats = FeatureExtractor
    .tickFeatures(ticks.toDF("game_id", "tick", "price"))

  private def g1Row(tick: Int) =
    feats.filter(col("game_id") === "g1" && col("tick") === tick).head()

  test("feature vector has all 13 features and one row per tick") {
    val cols = Seq("tick_percentile", "price_zscore", "iqr_position",
      "vol_ratio", "momentum_5", "acceleration", "vol_intensity",
      "spike_frequency", "ticks_since_spike", "death_spike_score",
      "drawdown_from_peak", "ticks_since_peak", "in_cooldown")
    cols.foreach(c => assert(feats.columns.contains(c), s"missing $c"))
    assert(feats.count() === 13)
  }

  test("tick percentile spans [0,1]; peak tracking follows the crash") {
    assert(g1Row(0).getAs[Double]("tick_percentile") === 0.0)
    assert(g1Row(9).getAs[Double]("tick_percentile") === 1.0)
    // peak is tick 5 (price 2.0); after the crash we drift from it
    assert(g1Row(5).getAs[Long]("ticks_since_peak") === 0L)
    assert(g1Row(9).getAs[Long]("ticks_since_peak") === 4L)
    assert(math.abs(g1Row(6).getAs[Double]("drawdown_from_peak") - (0.8 / 2.0 - 1)) < 1e-12)
  }

  test("spike accounting: the crash registers and starts the cooldown") {
    // tick 6: 0.8/2.0 - 1 = -60% => spike
    assert(g1Row(6).getAs[Long]("ticks_since_spike") === 0L)
    assert(g1Row(8).getAs[Long]("ticks_since_spike") === 2L)
    assert(g1Row(8).getAs[Boolean]("in_cooldown"))
    // death-spike score positive right after the crash
    assert(g1Row(6).getAs[Double]("death_spike_score") > 0)
    // quiet game g2: no spikes, never in cooldown
    val g2 = feats.filter(col("game_id") === "g2").collect()
    assert(g2.forall(r => r.isNullAt(r.fieldIndex("ticks_since_spike"))))
    assert(g2.forall(!_.getAs[Boolean]("in_cooldown")))
  }

  test("zscore/iqr are centered: min below, max above") {
    val z = feats.filter(col("game_id") === "g1")
      .select("price", "price_zscore").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(z(2.0) > 0 && z(0.8) < 0)
    assert(g1Row(5).getAs[Double]("iqr_position") > 1.0) // peak above q3
  }
}
