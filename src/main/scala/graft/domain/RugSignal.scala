package graft.domain

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F11 — tick-indexed base rug probability
  * (`src/analysis/bayesian_rug_signal.py:186-242`): P(rug within the next
  * 40 ticks | current tick), linear interpolation between expert curve
  * points, clamped to 0.10 below tick 0 and 0.96 above tick 500. The gap
  * STEP thresholds (the other half of the reference's Bayesian signal) are
  * `streaming.Detectors.gapLikelihoodRatio`.
  */
object RugSignal {

  /** (tick, probability) knots — `bayesian_rug_signal.py:188-214`. */
  val BaseProbabilityCurve: Vector[(Int, Double)] = Vector(
    0 -> 0.15, 10 -> 0.18, 20 -> 0.22, 30 -> 0.25, 40 -> 0.28,
    50 -> 0.32, 60 -> 0.35, 70 -> 0.38, 80 -> 0.42, 90 -> 0.45,
    100 -> 0.50, 120 -> 0.55, 140 -> 0.60, 160 -> 0.65, 180 -> 0.70,
    200 -> 0.74, 220 -> 0.77, 240 -> 0.80, 260 -> 0.83, 280 -> 0.86,
    300 -> 0.88, 350 -> 0.91, 400 -> 0.93, 450 -> 0.95, 500 -> 0.96)

  val BelowZero = 0.10
  val AboveMax = 0.96

  /** Scalar form (streaming state machines, tests). Parenthesized the
    * same way as the Column and SQL forms (divide first) so all three are
    * bit-identical.
    */
  def baseRugProbability(tick: Int): Double =
    if (tick < 0) BelowZero
    else if (tick > BaseProbabilityCurve.last._1) AboveMax
    else {
      val i = BaseProbabilityCurve.lastIndexWhere(_._1 <= tick)
      if (i == BaseProbabilityCurve.length - 1) BaseProbabilityCurve(i)._2
      else {
        val (t1, p1) = BaseProbabilityCurve(i)
        val (t2, p2) = BaseProbabilityCurve(i + 1)
        p1 + (p2 - p1) * ((tick - t1).toDouble / (t2 - t1))
      }
    }

  /** Pure column form: a chained CASE WHEN over the curve segments —
    * whole-stage-codegen'd branch ladder, no UDF. The segment conditions
    * only test the upper knot because CaseWhen evaluates in order (an
    * earlier branch already consumed every lower tick).
    */
  def baseRugProbability(tick: Column): Column = {
    val segments = BaseProbabilityCurve.zip(BaseProbabilityCurve.tail)
    val ladder = segments.foldLeft(
      when(tick < 0, BelowZero)) { case (acc, ((t1, p1), (t2, p2))) =>
      // ratio divided FIRST, then scaled — must match the generated SQL's
      // parenthesization exactly or the unrounded double drifts 1 ulp at
      // some ticks (139, 151 at these knots)
      acc.when(tick <= t2,
        lit(p1) + lit(p2 - p1) * ((tick - lit(t1)) / lit(t2 - t1)))
    }
    ladder.otherwise(AboveMax)
  }

  /** The same ladder as ANSI SQL, generated from the same knots — the
    * DuckDB oracle text can never drift from the Spark expression.
    */
  def baseRugProbabilitySql(tickExpr: String): String = {
    val segments = BaseProbabilityCurve.zip(BaseProbabilityCurve.tail)
    // parenthesized so the division happens before the multiply, exactly
    // like the Column form — bit-identical doubles on both engines
    val whens = segments.map { case ((t1, p1), (t2, p2)) =>
      s"WHEN $tickExpr <= $t2 THEN $p1 + ${p2 - p1} * (($tickExpr - $t1) / ${t2 - t1}.0)"
    }
    (s"CASE WHEN $tickExpr < 0 THEN $BelowZero" +: whens)
      .mkString("", " ", s" ELSE $AboveMax END")
  }
}
