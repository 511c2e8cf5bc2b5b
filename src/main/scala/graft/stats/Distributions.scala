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

  /** Freeman–Halton exact test for a 2×C table, two-sided p-value.
    *
    * The reference's FISHER option runs PROC FREQ's exact test on the full
    * `var × inBar` table (Categorical_Check.sas:298,305) — a C×2 table; by
    * transposition symmetry we compute it as 2×C with rows (in-group,
    * rest) / (group-i, group-j). Two-sided rule as in `fisherExact2x2`:
    * sum of probabilities of all same-margin tables whose point probability
    * ≤ observed (× 1+1e-7 slack), matching SAS PROC FREQ / R fisher.test.
    *
    * Algorithm: Mehta–Patel-style network enumeration. Tables are paths
    * x₁..x_C with Σxⱼ = r1, 0 ≤ xⱼ ≤ cⱼ; log point probability is
    * Σⱼ lchoose(cⱼ, xⱼ) − lchoose(n, r1). Three DP tables over
    * (column-suffix, remaining-r1) — min, max, and log-sum-exp total of the
    * suffix contribution — let the DFS terminate whole subtrees: if even
    * the minimum completion exceeds the cutoff the subtree contributes
    * nothing; if the maximum completion is within the cutoff the subtree's
    * entire probability mass is added from the total table without
    * descending.
    *
    * Returns None when the table is too large for exact enumeration
    * (n > maxN or the node budget trips) — callers fall back to chi-square
    * and flag `chisq_fallback` (SURVEY §7.6.2).
    */
  def fisherExact2xC(row1: Array[Long], row2: Array[Long],
      maxN: Long = 2000L, maxNodes: Long = 2000000L): Option[Double] = {
    require(row1.length == row2.length, "rows must have equal length")
    // drop all-zero columns: they admit only x=0 and contribute lchoose(0,0)=0
    val keep = row1.indices.filter(j => row1(j) + row2(j) > 0)
    val cC = keep.length
    if (cC == 0) return Some(Double.NaN)
    val colTot = keep.map(j => row1(j) + row2(j)).toArray
    val r1 = keep.map(row1(_)).sum
    val n = colTot.sum
    if (n == 0) return Some(Double.NaN)
    if (r1 == 0 || r1 == n) return Some(1.0)
    if (cC == 1) return Some(1.0) // single column: margins fix the table
    if (n > maxN) return None
    val r1i = r1.toInt
    // suffix capacity: how much of r1 the columns j..C-1 can still absorb
    val sufCap = new Array[Long](cC + 1)
    for (j <- cC - 1 to 0 by -1) sufCap(j) = sufCap(j + 1) + colTot(j)
    // lchoose(c_j, x) lookup per column
    val lch: Array[Array[Double]] =
      colTot.map(c => Array.tabulate(math.min(c, r1).toInt + 1)(x => lchoose(c, x)))
    // DP over (j, rem): min / max / log-sum-exp-total of Σ_{t>=j} lchoose(c_t, x_t)
    // with Σ x_t = rem. Entry -Inf (min/max) or NaN guard = infeasible.
    val NEG = Double.NegativeInfinity
    val minLp = Array.fill(cC + 1, r1i + 1)(NEG)
    val maxLp = Array.fill(cC + 1, r1i + 1)(NEG)
    val totLp = Array.fill(cC + 1, r1i + 1)(NEG)
    minLp(cC)(0) = 0.0; maxLp(cC)(0) = 0.0; totLp(cC)(0) = 0.0
    var j = cC - 1
    while (j >= 0) {
      var rem = 0
      while (rem <= r1i) {
        if (rem <= sufCap(j)) {
          val xLo = math.max(0L, rem - sufCap(j + 1)).toInt
          val xHi = math.min(colTot(j), rem.toLong).toInt
          var mn = Double.PositiveInfinity; var mx = NEG; var tot = NEG
          var x = xLo
          while (x <= xHi) {
            val nxt = rem - x
            if (maxLp(j + 1)(nxt) != NEG) {
              val l = lch(j)(x)
              val cmn = l + minLp(j + 1)(nxt)
              val cmx = l + maxLp(j + 1)(nxt)
              if (cmn < mn) mn = cmn
              if (cmx > mx) mx = cmx
              val ct = l + totLp(j + 1)(nxt)
              // log-sum-exp accumulate
              tot = if (tot == NEG) ct
                else if (ct == NEG) tot
                else { val hi2 = math.max(tot, ct); hi2 + math.log1p(math.exp(math.min(tot, ct) - hi2)) }
            }
            x += 1
          }
          if (mx != NEG) { minLp(j)(rem) = mn; maxLp(j)(rem) = mx; totLp(j)(rem) = tot }
        }
        rem += 1
      }
      j -= 1
    }
    if (maxLp(0)(r1i) == NEG) return Some(Double.NaN) // no feasible table
    val lnorm = lchoose(n, r1)
    val lpObs = keep.indices.map(t => lch(t)(row1(keep(t)).toInt)).sum
    val cutoff = lpObs + math.log1p(1e-7)
    var nodes = 0L
    var overBudget = false
    // DFS with subtree termination; accumulates Σ exp(lp_total − lnorm)
    def dfs(jj: Int, rem: Int, acc: Double): Double = {
      if (overBudget) return 0.0
      nodes += 1
      if (nodes > maxNodes) { overBudget = true; return 0.0 }
      if (acc + minLp(jj)(rem) > cutoff) return 0.0 // nothing qualifies
      if (acc + maxLp(jj)(rem) <= cutoff)           // everything qualifies
        return math.exp(acc + totLp(jj)(rem) - lnorm)
      val xLo = math.max(0L, rem - sufCap(jj + 1)).toInt
      val xHi = math.min(colTot(jj), rem.toLong).toInt
      var p = 0.0
      var x = xLo
      while (x <= xHi) {
        val nxt = rem - x
        if (maxLp(jj + 1)(nxt) != NEG)
          p += dfs(jj + 1, nxt, acc + lch(jj)(x))
        x += 1
      }
      p
    }
    val p = dfs(0, r1i, 0.0)
    if (overBudget) None else Some(math.min(1.0, p))
  }
}
