package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BacktestSpec extends SparkSpec {

  import spark.implicits._

  // (game_id, timestamp, duration_ticks, rug_tick)
  private lazy val games = Seq(
    ("g1", 1L, 300, 210), // rug inside bet-1 window [200,239] ⇒ win
    ("g2", 2L, 300, 250), // rug inside bet-2 window [245,284] ⇒ bet1 lost, bet2 win
    ("g3", 3L, 150, 140), // game ends before any window hits ⇒ bet1 placed+lost
    ("g4", 4L, 190, 180)  // rug before entry window ⇒ loss of placed bet1? see assert
  ).toDF("game_id", "timestamp", "duration_ticks", "rug_tick")

  test("strategy evaluation: first winning window wins, stakes compound") {
    val res = Backtest.evaluateStrategy(games, entryTick = 200, maxBets = 2,
        baseBetFrac = 0.01)
      .collect().map(r => r.getAs[String]("game_id") ->
        (r.getAs[Boolean]("won"), r.getAs[Double]("pnl"),
          r.getAs[Int]("n_bets_placed"))).toMap
    // g1: bet1 (stake .01) wins 6x at rug 210; the martingale stops after a
    // win, so bet2 (start 245) is never placed: pnl = .06 - .01
    assert(res("g1")._1)
    assert(math.abs(res("g1")._2 - (0.06 - 0.01)) < 1e-12)
    assert(res("g1")._3 === 1)
    // g2: bet1 lost, bet2 (stake .02) wins 6x = .12 - .03 staked
    assert(res("g2")._1)
    assert(math.abs(res("g2")._2 - (0.12 - 0.03)) < 1e-12)
    assert(res("g2")._3 === 2)
    // g3: duration 150 < entry 200 ⇒ nothing placed, pnl 0
    assert(!res("g3")._1 && res("g3")._2 === 0.0 && res("g3")._3 === 0)
    // g4: duration 190 < entry 200 ⇒ nothing placed either (rug at 180)
    assert(!res("g4")._1 && res("g4")._3 === 0)
  }

  test("hash split is deterministic and ~30% validation") {
    val n = 2000
    val df = (1 to n).map(i => (s"game-$i", i.toLong)).toDF("game_id", "timestamp")
    val s1 = Backtest.withSplit(df).groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val s2 = Backtest.withSplit(df).groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 === s2)
    val frac = s1("validation").toDouble / n
    assert(frac > 0.25 && frac < 0.35)
  }

  test("equity curve compounds pnl fractions in order (log-space prefix sum)") {
    val pnl = Seq(("g1", 1L, 0.10, true), ("g2", 2L, -0.05, false),
      ("g3", 3L, 0.20, true)).toDF("game_id", "timestamp", "pnl", "won")
    val eq = Backtest.equityCurve(pnl).orderBy("timestamp").collect()
    val expected = Seq(1.10, 1.10 * 0.95, 1.10 * 0.95 * 1.20)
    eq.zip(expected).foreach { case (row, e) =>
      assert(math.abs(row.getAs[Double]("bankroll") - e) < 1e-9)
    }
    val metrics = Backtest.sessionMetrics(
      Backtest.equityCurve(pnl).orderBy("timestamp")).head()
    assert(metrics.getAs[Long]("n_games") === 3L)
    assert(math.abs(metrics.getAs[Double]("win_rate") - 2.0 / 3) < 1e-12)
    assert(metrics.getAs[Double]("max_drawdown") > 0.0)
  }

  test("partitioned equity curves equal per-key curves computed alone") {
    // a strategy sweep: each strategy's curve must be the curve that
    // strategy would get on its own, computed in ONE partitioned pass
    val pnl = Seq(
      ("a", "g1", 1L, 0.10, true), ("a", "g2", 2L, -0.05, false),
      ("a", "g3", 3L, 0.30, true),
      ("b", "g1", 1L, -0.20, false), ("b", "g2", 2L, 0.50, true))
      .toDF("strategy", "game_id", "timestamp", "pnl", "won")
    val together = Backtest.equityCurve(pnl, partitionCols = Seq("strategy"))
      .select("strategy", "game_id", "bankroll", "peak", "drawdown")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    Seq("a", "b").foreach { strat =>
      val alone = Backtest.equityCurve(pnl.filter($"strategy" === strat))
        .select("game_id", "bankroll", "peak", "drawdown").collect()
      alone.foreach { r =>
        assert(together((strat, r.getString(0))) ===
          ((r.getDouble(1), r.getDouble(2), r.getDouble(3))), s"$strat/${r.getString(0)}")
      }
    }
    // and the plan has no single-partition exchange when partitioned
    val plan = Backtest.equityCurve(pnl, partitionCols = Seq("strategy"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"single-partition window:\n$plan")
  }
}
