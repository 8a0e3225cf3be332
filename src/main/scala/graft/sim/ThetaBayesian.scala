package graft.sim

/** D7 — Bayesian win-rate estimator with theta acceleration
  * (`src/recording_ui/services/monte_carlo.py:176-258`).
  *
  * A Beta(alpha, beta) posterior over the per-bet win probability, where
  * each observation adds `theta` (not 1) to the matching shape parameter.
  * Theta grows with the observation count — early games update
  * conservatively (theta ~ base), a long history updates aggressively
  * (theta -> max) — so the posterior converges to the empirical rate faster
  * than a textbook Beta-Bernoulli once confidence is established:
  *
  *   theta(n) = base + (max - base) * (1 - 1 / (1 + n / scale))
  *
  * with n = observations AFTER the increment (the reference increments
  * first, then computes theta). Immutable: `observe` returns the updated
  * estimator, so a fold over a game log is the natural batch form and the
  * struct can live inside a Spark aggregate without shared state.
  */
final case class ThetaBayesian(
    alpha: Double = 1.0,
    beta: Double = 1.0,
    thetaBase: Double = 1.0,
    thetaMax: Double = 4.0,
    thetaScale: Double = 50.0,
    observations: Long = 0L) {

  /** Acceleration factor for the NEXT observation. */
  def nextTheta: Double = {
    val n = observations + 1
    val progress = 1.0 - 1.0 / (1.0 + n / thetaScale)
    thetaBase + (thetaMax - thetaBase) * progress
  }

  def observe(win: Boolean): ThetaBayesian = {
    val t = nextTheta
    copy(
      alpha = if (win) alpha + t else alpha,
      beta = if (win) beta else beta + t,
      observations = observations + 1)
  }

  def observeAll(wins: IterableOnce[Boolean]): ThetaBayesian =
    wins.iterator.foldLeft(this)(_ observe _)

  /** Posterior mean win rate. */
  def mean: Double = alpha / (alpha + beta)

  def variance: Double = {
    val t = alpha + beta
    alpha * beta / (t * t * (t + 1.0))
  }

  def std: Double = math.sqrt(variance)

  /** Equal-tailed credible interval via the Beta quantile function. */
  def credibleInterval(confidence: Double = 0.95): (Double, Double) = (
    ThetaBayesian.betaPpf((1 - confidence) / 2, alpha, beta),
    ThetaBayesian.betaPpf(1 - (1 - confidence) / 2, alpha, beta))

  /** Kelly fraction from the posterior mean: f* = w - (1-w)/r, floored at
    * 0 (`monte_carlo.py:247-252`).
    */
  def kellyFraction(payoutRatio: Double): Double = {
    val w = mean
    math.max(0.0, w - (1 - w) / payoutRatio)
  }
}

object ThetaBayesian {

  /** Kelly fraction capped by a drawdown budget
    * (`position_sizing.py:237-303`): fractional Kelly, but never more than
    * maxDrawdown/4 of bankroll on one bet (four consecutive losses at the
    * cap lose exactly the budget).
    */
  def cappedKelly(winProbability: Double, payoutRatio: Double,
      kellyFraction: Double = 0.25, maxDrawdown: Double = 0.30): Double = {
    val full = math.max(0.0, winProbability - (1 - winProbability) / payoutRatio)
    if (full <= 0) 0.0 else math.min(full * kellyFraction, maxDrawdown / 4)
  }

  /** Regularized incomplete beta I_x(a, b) by the standard continued
    * fraction (Lentz's algorithm), the classical published construction —
    * converges fast for x < (a+1)/(a+b+2), with the symmetry
    * I_x(a,b) = 1 - I_{1-x}(b,a) covering the rest.
    */
  def betaCdf(x: Double, a: Double, b: Double): Double = {
    require(a > 0 && b > 0, s"shape parameters must be positive: ($a, $b)")
    if (x <= 0) 0.0
    else if (x >= 1) 1.0
    else if (x < (a + 1) / (a + b + 2)) {
      val lnFront = a * math.log(x) + b * math.log1p(-x) -
        math.log(a) - logBeta(a, b)
      math.exp(lnFront) * betacf(x, a, b)
    } else {
      // mirrored branch (I_x(a,b) = 1 - I_{1-x}(b,a)), fraction inlined —
      // a recursive call would ping-pong forever exactly at the threshold
      val lnFront = b * math.log1p(-x) + a * math.log(x) -
        math.log(b) - logBeta(b, a)
      1.0 - math.exp(lnFront) * betacf(1.0 - x, b, a)
    }
  }

  /** Beta quantile (inverse CDF) by monotone bisection on [[betaCdf]] —
    * 200 halvings reach ~1e-60 interval width, far past double precision;
    * robustness over Newton (no derivative blow-ups at the endpoints).
    */
  def betaPpf(q: Double, a: Double, b: Double): Double = {
    require(q >= 0 && q <= 1, s"quantile out of range: $q")
    if (q == 0) 0.0
    else if (q == 1) 1.0
    else {
      var lo = 0.0
      var hi = 1.0
      var i = 0
      while (i < 200) {
        val mid = (lo + hi) / 2
        if (betaCdf(mid, a, b) < q) lo = mid else hi = mid
        i += 1
      }
      (lo + hi) / 2
    }
  }

  private def logBeta(a: Double, b: Double): Double =
    logGamma(a) + logGamma(b) - logGamma(a + b)

  /** Lanczos log-gamma (g = 7, 9 coefficients) — the standard published
    * approximation, ~15 significant digits over the positive reals.
    */
  private def logGamma(x: Double): Double = {
    val g = 7.0
    val c = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5)
      math.log(math.Pi / math.sin(math.Pi * x)) - logGamma(1.0 - x)
    else {
      val z = x - 1.0
      var sum = c(0)
      var i = 1
      while (i < c.length) { sum += c(i) / (z + i); i += 1 }
      val t = z + g + 0.5
      0.5 * math.log(2 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(sum)
    }
  }

  /** Continued fraction for the incomplete beta (modified Lentz). */
  private def betacf(x: Double, a: Double, b: Double): Double = {
    val eps = 1e-15
    val fpmin = 1e-300
    val qab = a + b
    val qap = a + 1.0
    val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < fpmin) d = fpmin
    d = 1.0 / d
    var h = d
    var m = 1
    var converged = false
    while (m <= 300 && !converged) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < fpmin) d = fpmin
      c = 1.0 + aa / c
      if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < fpmin) d = fpmin
      c = 1.0 + aa / c
      if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < eps) converged = true
      m += 1
    }
    h
  }
}
