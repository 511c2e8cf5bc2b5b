package graft.stats

import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite {

  test("chi-square p-values match known quantiles") {
    // 3.841459 is the 95th percentile of chi2(1); 16.919 of chi2(9)
    assert(math.abs(Distributions.chiSqPValue(3.841459, 1) - 0.05) < 1e-5)
    assert(math.abs(Distributions.chiSqPValue(16.918978, 9) - 0.05) < 1e-5)
    assert(Distributions.chiSqPValue(0.0, 5) == 1.0)
  }

  test("t quantiles match published tables") {
    assert(math.abs(Distributions.tInv(0.95, 10) - 1.812461) < 1e-5)
    assert(math.abs(Distributions.tInv(0.975, 5) - 2.570582) < 1e-5)
  }

  test("tinv low-df workaround substitutes df=1.12 (longitudinalPlot.sas:453-456)") {
    val direct = Distributions.tInv(0.95, 1.12)
    assert(Distributions.tInv(0.95, 0.5, sasLowDfWorkaround = true) == direct)
    assert(Distributions.tInv(0.95, 2.0, sasLowDfWorkaround = true) ==
      Distributions.tInv(0.95, 2.0))
  }

  test("F p-value matches known quantile") {
    // F(1, 10) 95th percentile = 4.9646
    assert(math.abs(Distributions.fPValue(4.964603, 1, 10) - 0.05) < 1e-5)
  }

  test("Fisher exact 2x2 two-sided matches R fisher.test") {
    // matrix(c(3,1,1,3)) → p = 0.4857143
    assert(math.abs(Distributions.fisherExact2x2(3, 1, 1, 3) - 0.4857143) < 1e-6)
    // matrix(c(10,0,0,10)) → p = 1.083e-05
    assert(math.abs(Distributions.fisherExact2x2(10, 0, 0, 10) - 1.0825e-5) < 1e-8)
    // degenerate margins
    assert(Distributions.fisherExact2x2(5, 5, 0, 0) == 1.0)
  }

  test("Freeman-Halton 2xC exact matches brute-force enumeration") {
    // expected values from an independent exact-integer brute force
    // (sum of hypergeometric probabilities of all same-margin tables with
    // point probability <= observed, the SAS/R two-sided rule)
    def fh(r1: Seq[Long], r2: Seq[Long]): Double =
      Distributions.fisherExact2xC(r1.toArray, r2.toArray).get
    assert(math.abs(fh(Seq(40, 30, 20), Seq(20, 30, 40)) - 0.0012350309) < 1e-9)
    assert(math.abs(fh(Seq(1, 2, 3), Seq(3, 2, 1)) - 0.7662337662) < 1e-9)
    assert(math.abs(fh(Seq(5, 0, 2), Seq(1, 4, 3)) - 0.0497280497) < 1e-9)
    assert(math.abs(fh(Seq(8, 2, 0, 1), Seq(2, 5, 4, 1)) - 0.0190832186) < 1e-9)
    assert(math.abs(fh(Seq(12, 7, 3, 1, 0), Seq(4, 6, 5, 2, 3)) - 0.0894278401) < 1e-9)
  }

  test("Freeman-Halton C=2 agrees with the 2x2 path") {
    assert(math.abs(Distributions.fisherExact2xC(Array(10L, 5L), Array(2L, 9L)).get -
      Distributions.fisherExact2x2(10, 5, 2, 9)) < 1e-12)
    assert(math.abs(Distributions.fisherExact2xC(Array(3L, 1L), Array(1L, 3L)).get -
      0.4857142857) < 1e-9)
    assert(math.abs(Distributions.fisherExact2xC(Array(10L, 0L), Array(0L, 10L)).get -
      1.0825e-5) < 1e-8)
  }

  test("Freeman-Halton edge cases and enumeration budget") {
    // degenerate: one row empty / single effective column → p = 1
    assert(Distributions.fisherExact2xC(Array(0L, 0L, 0L), Array(3L, 2L, 1L)).get == 1.0)
    assert(Distributions.fisherExact2xC(Array(4L, 0L), Array(3L, 0L)).get == 1.0)
    // all-zero columns are dropped, not counted
    assert(math.abs(Distributions.fisherExact2xC(Array(3L, 0L, 1L), Array(1L, 0L, 3L)).get -
      0.4857142857) < 1e-9)
    // over the n budget → None (caller falls back to chi-square, flagged)
    assert(Distributions.fisherExact2xC(
      Array(2000L, 1500L), Array(1500L, 2000L)).isEmpty)
    // large-but-within-budget tables complete via subtree termination
    val p = Distributions.fisherExact2xC(
      Array(300L, 250L, 200L), Array(200L, 250L, 300L))
    assert(p.isDefined && p.get > 0 && p.get < 1e-4)
  }

  test("Holm step-down matches hand computation and preserves order") {
    val adj = Holm.adjust(Seq(0.01, 0.04, 0.03, 0.005))
    val exp = Seq(0.03, 0.06, 0.06, 0.02)
    adj.zip(exp).foreach { case (a, e) => assert(math.abs(a - e) < 1e-12) }
  }

  test("Holm treats NaN as missing (not counted in m)") {
    val adj = Holm.adjust(Seq(0.01, Double.NaN, 0.04))
    assert(adj(1).isNaN)
    assert(math.abs(adj(0) - 0.02) < 1e-12) // m = 2
    assert(math.abs(adj(2) - 0.04) < 1e-12)
  }

  test("OLS solve matches direct computation on a hand-checkable design") {
    // y = 2 + 3x with noise-free data → beta exact, SSE 0
    val xs = Array(1.0, 2.0, 3.0, 4.0)
    val ys = xs.map(x => 2.0 + 3.0 * x)
    val p = 2
    val sxx = Array(
      xs.length.toDouble, xs.sum,
      xs.sum, xs.map(x => x * x).sum)
    val sxy = Array(ys.sum, xs.zip(ys).map { case (x, y) => x * y }.sum)
    val fit = Ols.solve(4, ys.sum, ys.map(y => y * y).sum, sxy, sxx)
    assert(math.abs(fit.beta(0) - 2.0) < 1e-9)
    assert(math.abs(fit.beta(1) - 3.0) < 1e-9)
    assert(fit.rank == 2)
    assert(fit.dfe == 2.0)
    assert(math.abs(fit.s2) < 1e-9)
  }

  test("rStudent matches an independent brute-force implementation") {
    // independent oracle: full leave-one-out refit per row
    val xs = Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 10.0)
    val ys = Array(1.1, 2.3, 2.8, 4.2, 5.1, 5.6, 14.0) // last point an outlier
    val n = xs.length
    def olsFit(ix: Seq[Int]): (Double, Double, Double) = { // (b0, b1, s2)
      val m = ix.size.toDouble
      val sx = ix.map(xs).sum; val sy = ix.map(ys).sum
      val sxx = ix.map(i => xs(i) * xs(i)).sum
      val sxy = ix.map(i => xs(i) * ys(i)).sum
      val b1 = (sxy - sx * sy / m) / (sxx - sx * sx / m)
      val b0 = sy / m - b1 * sx / m
      val sse = ix.map(i => math.pow(ys(i) - b0 - b1 * xs(i), 2)).sum
      (b0, b1, sse / (m - 2))
    }
    // engine path: Gram solve + closed-form rowStats
    val sxxM = Array(n.toDouble, xs.sum, xs.sum, xs.map(x => x * x).sum)
    val sxyV = Array(ys.sum, xs.zip(ys).map { case (a, b) => a * b }.sum)
    val fit = Ols.solve(n, ys.sum, ys.map(y => y * y).sum, sxyV, sxxM)
    // brute-force studentized deleted residual for row i:
    // e_i / sqrt(s2_(i) * (1 - h_i)) with s2_(i) from the n-1 point fit
    for (i <- 0 until n) {
      val others = (0 until n).filterNot(_ == i)
      val (b0i, b1i, s2i) = olsFit(others)
      val xbar = xs.sum / n
      val sxxC = xs.map(x => (x - xbar) * (x - xbar)).sum
      val h = 1.0 / n + (xs(i) - xbar) * (xs(i) - xbar) / sxxC
      // standard identity: rstudent_i = e_i / sqrt(s2_(i) (1 - h_i))
      val (_, _, rs, _) = Ols.rowStats(fit, Array(1.0, xs(i)), ys(i))
      val eI = ys(i) - (fit.beta(0) + fit.beta(1) * xs(i))
      val direct = eI / math.sqrt(s2i * (1 - h))
      assert(math.abs(rs - direct) < 1e-8, s"row $i: engine=$rs direct=$direct")
    }
    // the planted point must have the largest |rstudent|
    val rss = (0 until n).map { i =>
      math.abs(Ols.rowStats(fit, Array(1.0, xs(i)), ys(i))._3)
    }
    assert(rss.indexOf(rss.max) == n - 1)
  }

  test("variance components recover planted values on balanced data") {
    // 200 subjects × 50 obs, σ_b=2, σ_e=1 via deterministic pseudo-noise
    val rng = new scala.util.Random(42)
    val perSubject = (1 to 200).map { i =>
      val b = 2.0 * rng.nextGaussian()
      val es = (1 to 50).map(_ => rng.nextGaussian())
      val ys = es.map(e => b + e)
      (50L, ys.sum, ys.map(y => y * y).sum)
    }
    val est = VarComp.fromResidualStats(perSubject)
    assert(math.abs(est.sigmaB2 - 4.0) < 1.0, s"sigmaB2=${est.sigmaB2}")
    assert(math.abs(est.sigmaE2 - 1.0) < 0.1, s"sigmaE2=${est.sigmaE2}")
  }

  test("whitening coefficients produce unit marginal variance structure") {
    val est = VarComp.Estimate(sigmaB2 = 4.0, sigmaE2 = 1.0, 10, 100)
    val n = 5L
    val (a, b) = VarComp.whitenCoeffs(est, n)
    // applying to V = σe²I + σb²J must give identity: check the two
    // eigenvalues of (aI + bJ) V (aI + bJ)
    val lam1 = est.sigmaE2 + n * est.sigmaB2 // on the 1-vector
    val w1 = (a + n * b) * (a + n * b) * lam1
    val lam2 = est.sigmaE2
    val w2 = a * a * lam2
    assert(math.abs(w1 - 1.0) < 1e-12)
    assert(math.abs(w2 - 1.0) < 1e-12)
  }

  test("KLL sketch merge equals single-pass sketch") {
    val a = (1 to 1000).map(_.toDouble)
    val (left, right) = a.splitAt(400)
    import org.apache.datasketches.kll.KllDoublesSketch
    val s1 = KllDoublesSketch.newHeapInstance(200)
    left.foreach(s1.update)
    val s2 = KllDoublesSketch.newHeapInstance(200)
    right.foreach(s2.update)
    val merged = KllSketchAgg.merge(Seq(s1.toByteArray, s2.toByteArray))
    val full = KllDoublesSketch.newHeapInstance(200)
    a.foreach(full.update)
    val qm = KllSketchAgg.quantiles(merged, Array(0.5))
    val qf = KllSketchAgg.quantiles(full.toByteArray, Array(0.5))
    assert(math.abs(qm(0) - qf(0)) <= 15.0) // both ~500 within sketch error
    assert(KllSketchAgg.n(merged) == 1000)
  }

}
