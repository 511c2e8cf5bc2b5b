package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** Fully distributed per-key estimates — the same MoM arithmetic as
    * `fromResidualStats` expressed as a second aggregation over the
    * per-subject stats frame, so NOTHING row- or subject-proportional ever
    * reaches the driver (at 10^12 rows the subject count is itself 10^8+).
    *
    * @param subjStats one row per (key, subject): columns (keyCol, n, s, ss)
    *                  where n = rows, s = Σ r, ss = Σ r².
    * @return one row per key: (keyCol, sigma_b2, sigma_e2, k_subjects, n_rows)
    *         — broadcast-joinable against the row frame for whitening.
    */
  def estimates(subjStats: DataFrame, keyCol: String = "__key"): DataFrame = {
    val nan = lit(Double.NaN)
    subjStats.groupBy(col(keyCol))
      .agg(
        sum("n").as("n"),
        count(lit(1)).as("k"),
        sum("s").as("gs"),
        sum(col("ss") - col("s") * col("s") / col("n")).as("ssw"),
        sum(col("n") * pow(col("s") / col("n"), 2)).as("sgm2"),
        sum(col("n") * col("n")).as("sn2"))
      .withColumn("msw", when(col("n") > col("k"), col("ssw") / (col("n") - col("k"))).otherwise(nan))
      .withColumn("msb", when(col("k") > 1,
        (col("sgm2") - col("gs") * col("gs") / col("n")) / (col("k") - 1)).otherwise(nan))
      .withColumn("n0", when(col("k") > 1,
        (col("n") - col("sn2") / col("n")) / (col("k") - 1)).otherwise(nan))
      .select(
        col(keyCol),
        when(col("k") > 1 && col("n0") > 0 && !isnan(col("msb")) && !isnan(col("msw")),
          greatest((col("msb") - col("msw")) / col("n0"), lit(0.0)))
          .otherwise(0.0).as("sigma_b2"),
        col("msw").as("sigma_e2"),
        col("k").as("k_subjects"),
        col("n").as("n_rows"))
  }

  /** Whitening coefficients as pure column arithmetic over an
    * `estimates`-joined row frame: r* = a·r + b·(Σ r over the entity),
    * a = 1/σₑ, b = (1/√(σ²ₑ + n σ²_b) − a)/n. NaN-total like `whitenCoeffs`.
    *
    * @param nCol per-row entity size column. */
  def whitenExpr(nCol: org.apache.spark.sql.Column, rCol: org.apache.spark.sql.Column,
      rsumCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val se = sqrt(col("sigma_e2"))
    val a = lit(1.0) / se
    val b = (lit(1.0) / sqrt(col("sigma_e2") + nCol * col("sigma_b2")) - a) / nCol
    when(nCol <= 0 || isnan(se) || se <= 0 || col("sigma_e2").isNull, lit(Double.NaN))
      .otherwise(a * rCol + b * rsumCol)
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
