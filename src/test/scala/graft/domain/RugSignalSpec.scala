package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RugSignalSpec extends SparkSpec {

  import spark.implicits._

  test("scalar curve hits every knot exactly and clamps outside [0, 500]") {
    for ((t, p) <- RugSignal.BaseProbabilityCurve)
      assert(RugSignal.baseRugProbability(t) === p, s"knot at tick $t")
    assert(RugSignal.baseRugProbability(-1) === 0.10)
    assert(RugSignal.baseRugProbability(-100) === 0.10)
    assert(RugSignal.baseRugProbability(501) === 0.96)
    assert(RugSignal.baseRugProbability(100000) === 0.96)
  }

  test("scalar curve linearly interpolates between every pair of knots") {
    val knots = RugSignal.BaseProbabilityCurve
    for (((t1, p1), (t2, p2)) <- knots.zip(knots.tail); t <- (t1 + 1) until t2) {
      val expected = p1 + (p2 - p1) * (t - t1).toDouble / (t2 - t1)
      assert(math.abs(RugSignal.baseRugProbability(t) - expected) < 1e-15,
        s"tick $t in segment [$t1, $t2]")
    }
    // probabilities are monotone nondecreasing across the whole domain
    val probs = (-5 to 505).map(RugSignal.baseRugProbability)
    assert(probs.zip(probs.tail).forall { case (a, b) => a <= b })
  }

  test("column form agrees with the scalar form on every tick -5..505") {
    val ticks = (-5 to 505).toDF("tick")
    val got = ticks
      .select(col("tick"), RugSignal.baseRugProbability(col("tick")).as("p"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    for (t <- -5 to 505)
      assert(got(t) === RugSignal.baseRugProbability(t), s"tick $t")
  }
}
