package graft.stats

import org.apache.commons.math3.distribution.{
  ChiSquaredDistribution, FDistribution, TDistribution, NormalDistribution
}

/** Statistical distribution helpers for the validation engine.
  *
  * The reference computes p-values / cutoffs inside SAS PROCs:
  *   - chi-square tests: Categorical_Check.sas:300-307, DigitPref.sas:349-355
  *   - Brown-Forsythe F:  groupComparisons.sas:461-470
  *   - t-quantile cutoff: univariatePlot.sas:365, longitudinalPlot.sas:453-456
  *
  * We re-derive them from commons-math3 (public, on the Spark classpath).
  * All functions are pure and total (return NaN-safe defaults on bad input),
  * so they can be used inside Spark UDFs or on collected group-level stats.
  */
object Distributions {

  /** Upper-tail p-value of a chi-square statistic with df degrees of freedom. */
  def chiSqPValue(stat: Double, df: Double): Double =
    if (df <= 0 || stat.isNaN) Double.NaN
    else if (stat <= 0) 1.0
    else 1.0 - new ChiSquaredDistribution(df).cumulativeProbability(stat)

  /** Upper-tail p-value of an F statistic. */
  def fPValue(stat: Double, dfNum: Double, dfDen: Double): Double =
    if (dfNum <= 0 || dfDen <= 0 || stat.isNaN) Double.NaN
    else if (stat <= 0) 1.0
    else 1.0 - new FDistribution(dfNum, dfDen).cumulativeProbability(stat)

  /** Two-sided p-value of a t statistic. */
  def tPValue2(stat: Double, df: Double): Double =
    if (df <= 0 || stat.isNaN) Double.NaN
    else 2.0 * (1.0 - new TDistribution(df).cumulativeProbability(math.abs(stat)))

  /** Quantile of the t distribution — SAS `tinv(p, df)`.
    *
    * Reproduces the reference's low-df workaround: for df < 1.12 the macro
    * substitutes df = 1.12 before calling tinv (longitudinalPlot.sas:453-456),
    * because SAS tinv is unstable there. We mirror that exactly so golden
    * flagged-record sets match.
    */
  def tInv(p: Double, df: Double, sasLowDfWorkaround: Boolean = false): Double = {
    val d = if (sasLowDfWorkaround && df < 1.12) 1.12 else df
    if (d <= 0 || p <= 0 || p >= 1) Double.NaN
    else new TDistribution(d).inverseCumulativeProbability(p)
  }

  /** Standard normal quantile (used by sketch error bounds). */
  def normInv(p: Double): Double =
    new NormalDistribution(0, 1).inverseCumulativeProbability(p)

  /** Fisher's exact test, 2x2 table, two-sided p-value.
    *
    * Reference: Categorical_Check.sas:298,305 keeps XP2_FISH (two-sided).
    * Two-sided rule: sum of probabilities of all tables (with the same
    * margins) whose point probability <= observed point probability
    * (times 1+1e-7 slack for float noise) — this matches SAS PROC FREQ and
    * R fisher.test for 2x2.
    */
  def fisherExact2x2(a: Long, b: Long, c: Long, d: Long): Double = {
    val r1 = a + b; val r2 = c + d; val c1 = a + c; val n = a + b + c + d
    if (n == 0) return Double.NaN
    if (r1 == 0 || r2 == 0 || c1 == 0 || c1 == n) return 1.0
    // log point probability of table with top-left = x
    def lpt(x: Long): Double =
      lchoose(r1, x) + lchoose(r2, c1 - x) - lchoose(n, c1)
    val lo = math.max(0L, c1 - r2)
    val hi = math.min(r1, c1)
    val lpObs = lpt(a)
    val cutoff = lpObs + math.log1p(1e-7)
    var p = 0.0
    var x = lo
    while (x <= hi) {
      val lp = lpt(x)
      if (lp <= cutoff) p += math.exp(lp)
      x += 1
    }
    math.min(1.0, p)
  }

  private def lchoose(n: Long, k: Long): Double =
    if (k < 0 || k > n) Double.NegativeInfinity
    else org.apache.commons.math3.special.Gamma.logGamma(n + 1.0) -
      org.apache.commons.math3.special.Gamma.logGamma(k + 1.0) -
      org.apache.commons.math3.special.Gamma.logGamma(n - k + 1.0)
}
