package graft.domain

import graft.SparkSpec
import graft.domain.VolatilityAggregator.{Agg, TickRow}
import org.apache.spark.sql.functions._

class VolatilityAggregatorSpec extends SparkSpec {

  import spark.implicits._

  private val g1 = Vector(1.0, 1.1, 1.5, 1.2, 0.9) // has a +36% and -25% spike
  private val g2 = Vector(2.0, 2.02, 2.04)

  private lazy val ticks =
    (g1.zipWithIndex.map { case (p, i) => TickRow("g1", i, p) } ++
      g2.zipWithIndex.map { case (p, i) => TickRow("g2", i, p) })

  test("aggregator matches the single-pass reference computation per game") {
    // shuffle input order: the aggregator must sort by tick before folding
    val ds = scala.util.Random.shuffle(ticks).toDS().repartition(4)
    val got = ds.groupByKey(_.game_id)
      .agg(new Agg().toColumn.name("m"))
      .collect().toMap
    assert(got("g1") === VolatilityAggregator.fromPrices(g1))
    assert(got("g2") === VolatilityAggregator.fromPrices(g2))
  }

  test("aggregator agrees with the array-based GameAnalytics form") {
    val games = Seq(("g1", 1L, g1), ("g2", 2L, g2))
      .toDF("game_id", "timestamp", "prices")
      .withColumn("peak_multiplier", lit(1.0))
    val arrayForm = GameAnalytics.volatilityMetrics(games)
      .collect().map(r => r.getAs[String]("game_id") -> r).toMap
    val agg = ticks.toDS().groupByKey(_.game_id)
      .agg(new Agg().toColumn.name("m")).collect().toMap
    Seq("g1", "g2").foreach { g =>
      val a = arrayForm(g)
      val m = agg(g)
      assert(math.abs(a.getAs[Double]("price_std") - m.price_std) < 1e-12)
      assert(math.abs(a.getAs[Double]("return_std") - m.return_std) < 1e-12)
      assert(math.abs(a.getAs[Double]("log_return_std") - m.log_return_std) < 1e-12)
      assert(a.getAs[Int]("spike_count") === m.spike_count)
      assert(a.getAs[Double]("final_price") === m.final_price)
    }
  }

  test("oversized episode fails fast with a diagnosable message, not an OOM") {
    val rows = (1 to 10).map(i => VolatilityAggregator.TickRow("g", i, 1.0 + i))
    val e = intercept[Exception] {
      rows.toDS().groupByKey(_.game_id)
        .agg(new VolatilityAggregator.Agg(maxTicks = 5).toColumn.name("m"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("cap 5")))
  }

  test("vol-of-vol matches pandas rolling(10).std() -> np.std semantics") {
    // prices = 1.0 + 0.1*sin(i) + 0.01*i, i in 0..29 => 29 returns (>= 20).
    // Expected value computed independently with pandas/numpy:
    //   np.std(pd.Series(np.diff(p)/p[:-1]).rolling(10).std().dropna())
    val prices = (0 until 30).map(i => 1.0 + 0.1 * math.sin(i) + 0.01 * i).toVector
    val pandasValue = 0.003910810264258176
    val scalarForm = VolatilityAggregator.fromPrices(prices).vol_of_vol
    assert(math.abs(scalarForm - pandasValue) < 1e-12)
    val games = Seq(("g", 1L, prices)).toDF("game_id", "timestamp", "prices")
      .withColumn("peak_multiplier", lit(1.0))
    val arrayForm = GameAnalytics.volatilityMetrics(games)
      .head().getAs[Double]("vol_of_vol")
    // one-pass sum/sumsq slice std vs two-pass centered: agree to ~1e-9
    assert(math.abs(arrayForm - pandasValue) < 1e-9)
  }

  test("vol-of-vol is 0.0 below 20 returns (study gate)") {
    assert(VolatilityAggregator.fromPrices(g1).vol_of_vol === 0.0)
    val games = Seq(("g1", 1L, g1)).toDF("game_id", "timestamp", "prices")
      .withColumn("peak_multiplier", lit(1.0))
    assert(GameAnalytics.volatilityMetrics(games)
      .head().getAs[Double]("vol_of_vol") === 0.0)
  }

  test("spike accounting: every |return| > 10% counts, largest wins") {
    // returns: +10.0..009% (FP: 1.1/1.0-1 > 0.1), +36.4%, -20%, -25% => 4
    val m = VolatilityAggregator.fromPrices(g1)
    assert(m.spike_count === 4)
    assert(math.abs(m.max_spike_magnitude - (1.5 / 1.1 - 1)) < 1e-12)
    assert(m.duration_ticks === 5 && m.final_price === 0.9)
  }
}
