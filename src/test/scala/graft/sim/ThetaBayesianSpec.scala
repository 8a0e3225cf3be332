package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class ThetaBayesianSpec extends AnyFunSuite {

  /** Seeded sampling loop — the scalatest-scalacheck bridge isn't on the
    * offline classpath (same pattern as PropertySpec).
    */
  private def forAll[A](gen: Gen[A], n: Int = 25)(f: A => Unit): Unit = {
    var seed = Seed(1337L)
    var done = 0
    var attempts = 0
    while (done < n && attempts < n * 20) {
      gen.apply(Gen.Parameters.default.withSize(40), seed).foreach { a =>
        f(a); done += 1
      }
      seed = seed.next
      attempts += 1
    }
    assert(done == n, s"generator produced only $done/$n samples")
  }

  // -- posterior update semantics (monte_carlo.py:176-258) ------------------

  test("posterior matches the closed form: prior + sum of thetas per side") {
    forAll(Gen.listOfN(120, Gen.oneOf(true, false))) { wins =>
      val est = ThetaBayesian().observeAll(wins)
      def theta(n: Int): Double = 1.0 + 3.0 * (1.0 - 1.0 / (1.0 + n / 50.0))
      val thetas = (1 to wins.size).map(theta)
      val expAlpha = 1.0 + wins.zip(thetas).collect { case (true, t) => t }.sum
      val expBeta = 1.0 + wins.zip(thetas).collect { case (false, t) => t }.sum
      assert(math.abs(est.alpha - expAlpha) < 1e-9)
      assert(math.abs(est.beta - expBeta) < 1e-9)
      assert(math.abs(est.mean - expAlpha / (expAlpha + expBeta)) < 1e-12)
    }
  }

  test("theta accelerates from base toward max as observations grow") {
    val fresh = ThetaBayesian()
    // n=1: 1 + 3*(1 - 1/1.02) = 1 + 3/51
    assert(math.abs(fresh.nextTheta - (1.0 + 3.0 / 51.0)) < 1e-12)
    val seasoned = ThetaBayesian(observations = 10000)
    assert(seasoned.nextTheta > 3.9 && seasoned.nextTheta < 4.0)
    // strictly increasing in n
    val ts = (0 until 500).map(n => ThetaBayesian(observations = n).nextTheta)
    assert(ts.zip(ts.tail).forall { case (a, b) => a < b })
  }

  test("posterior mean/variance match the Beta closed forms") {
    val e = ThetaBayesian(alpha = 3.0, beta = 7.0)
    assert(e.mean === 0.3)
    assert(math.abs(e.variance - 3.0 * 7.0 / (100.0 * 11.0)) < 1e-15)
    assert(math.abs(e.std - math.sqrt(e.variance)) < 1e-15)
  }

  test("kelly fraction is w - (1-w)/r floored at zero") {
    val e = ThetaBayesian(alpha = 3.0, beta = 7.0) // mean 0.3
    assert(math.abs(e.kellyFraction(5.0) - (0.3 - 0.7 / 5.0)) < 1e-12)
    val hopeless = ThetaBayesian(alpha = 1.0, beta = 99.0) // mean 0.01
    assert(hopeless.kellyFraction(5.0) === 0.0)
  }

  test("capped kelly: fractional kelly bounded by maxDrawdown/4") {
    // full kelly at w=0.5, r=5: 0.5 - 0.1 = 0.4; quarter = 0.1 > 0.3/4 cap
    assert(ThetaBayesian.cappedKelly(0.5, 5.0) === 0.075)
    // small edge: quarter-kelly under the cap passes through
    val full = 0.2 - 0.8 / 5.0 // = 0.04
    assert(math.abs(ThetaBayesian.cappedKelly(0.2, 5.0) - full * 0.25) < 1e-12)
    assert(ThetaBayesian.cappedKelly(0.05, 5.0) === 0.0)
  }

  // -- Beta CDF/quantile against exact closed forms -------------------------

  test("betaCdf matches exact closed-form distributions") {
    val xs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    for (x <- xs) {
      assert(math.abs(ThetaBayesian.betaCdf(x, 1, 1) - x) < 1e-12) // uniform
      assert(math.abs(ThetaBayesian.betaCdf(x, 2, 1) - x * x) < 1e-12)
      assert(math.abs(ThetaBayesian.betaCdf(x, 1, 2) - (1 - (1 - x) * (1 - x))) < 1e-12)
      val arcsine = 2.0 / math.Pi * math.asin(math.sqrt(x))
      assert(math.abs(ThetaBayesian.betaCdf(x, 0.5, 0.5) - arcsine) < 1e-10)
    }
  }

  test("betaPpf inverts betaCdf across shapes (roundtrip)") {
    val shapes = Seq((1.0, 1.0), (2.0, 9.0), (3.7, 12.2), (14.8, 52.6), (0.5, 0.5))
    val qs = Seq(0.025, 0.1, 0.5, 0.9, 0.975)
    for ((a, b) <- shapes; q <- qs) {
      val x = ThetaBayesian.betaPpf(q, a, b)
      assert(math.abs(ThetaBayesian.betaCdf(x, a, b) - q) < 1e-9,
        s"roundtrip failed at q=$q a=$a b=$b x=$x")
    }
    // exact inverse for the analytic cases
    assert(math.abs(ThetaBayesian.betaPpf(0.25, 2, 1) - math.sqrt(0.25)) < 1e-12)
    assert(math.abs(ThetaBayesian.betaPpf(0.19, 1, 2) - (1 - math.sqrt(0.81))) < 1e-12)
  }

  test("credible interval: uniform prior gives (q/2, 1-q/2); intervals nest") {
    val flat = ThetaBayesian()
    val (lo, hi) = flat.credibleInterval(0.95)
    assert(math.abs(lo - 0.025) < 1e-10 && math.abs(hi - 0.975) < 1e-10)
    val e = ThetaBayesian(alpha = 14.8, beta = 52.6)
    val (l95, h95) = e.credibleInterval(0.95)
    val (l50, h50) = e.credibleInterval(0.50)
    assert(l95 < l50 && h50 < h95) // 50% interval nests inside 95%
    assert(l95 < e.mean && e.mean < h95)
  }
}
