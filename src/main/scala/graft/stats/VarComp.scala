package graft.stats

/** Random-intercept variance components by ANOVA method-of-moments.
  *
  * Replaces the reference's default PROC MIXED configuration — random
  * intercept per subject, ddfm=residual (longitudinalPlot.sas:423-442,
  * groupComparisons.sas:393-401). Per SURVEY.md §7.6(1), full REML /
  * type=UN parity is out of scope; the random-intercept default reduces to
  * two variance components estimable from per-subject sufficient statistics
  * of the fixed-effect residuals:
  *
  *   MSW = Σᵢ Σⱼ (rᵢⱼ − r̄ᵢ)² / (N − k)                → σ²_e
  *   MSB = Σᵢ nᵢ (r̄ᵢ − r̄)² / (k − 1)
  *   n₀  = (N − Σ nᵢ²/N) / (k − 1)
  *   σ²_b = max(0, (MSB − MSW) / n₀)
  *
  * where i ranges over k subjects with nᵢ rows each, N = Σ nᵢ.
  */
object VarComp {

  final case class Estimate(sigmaB2: Double, sigmaE2: Double, nSubjects: Long, nRows: Long) {
    /** Marginal variance of one observation. */
    def marginal: Double = sigmaB2 + sigmaE2
  }

  /** @param perSubject (nᵢ, Σⱼ rᵢⱼ, Σⱼ rᵢⱼ²) per subject, from one groupBy pass. */
  def fromResidualStats(perSubject: Seq[(Long, Double, Double)]): Estimate = {
    val k = perSubject.size.toLong
    val n = perSubject.map(_._1).sum
    if (k == 0 || n == 0) return Estimate(Double.NaN, Double.NaN, k, n)
    val grandSum = perSubject.map(_._2).sum
    val grandMean = grandSum / n
    var ssw = 0.0
    var ssb = 0.0
    var sumNi2 = 0.0
    perSubject.foreach { case (ni, s, ss) =>
      if (ni > 0) {
        val mi = s / ni
        ssw += ss - ni * mi * mi
        ssb += ni * (mi - grandMean) * (mi - grandMean)
        sumNi2 += ni.toDouble * ni
      }
    }
    val msw = if (n - k > 0) ssw / (n - k) else Double.NaN
    val msb = if (k > 1) ssb / (k - 1) else Double.NaN
    val n0 = if (k > 1) (n - sumNi2 / n) / (k - 1) else Double.NaN
    val sigmaB2 =
      if (k > 1 && n0 > 0 && !msb.isNaN && !msw.isNaN) math.max(0.0, (msb - msw) / n0)
      else 0.0
    Estimate(sigmaB2, msw, k, n)
  }

  /** Coefficients (a, b) of the symmetric inverse square root of the
    * marginal covariance V = σ²ₑI + σ²_b J for a subject with n rows:
    * scaled residual r*ᵢⱼ = a·rᵢⱼ + b·(Σⱼ rᵢⱼ).
    *
    * Stands in for PROC MIXED's `vciry` inverse-Cholesky scaling
    * (groupComparisons.sas:393-401); we use the symmetric root (same
    * whitening property, orthogonally equivalent) — deviation documented
    * per SURVEY.md §2.7 M5.
    */
  def whitenCoeffs(est: Estimate, n: Long): (Double, Double) = {
    val se = math.sqrt(est.sigmaE2)
    if (n <= 0 || se.isNaN || se <= 0) return (Double.NaN, Double.NaN)
    val a = 1.0 / se
    val b = (1.0 / math.sqrt(est.sigmaE2 + n * est.sigmaB2) - a) / n
    (a, b)
  }
}
