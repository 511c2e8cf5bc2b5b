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

  /** Per-(key, subject-size) sufficient statistics for exact REML.
    *
    * Subjects with equal nᵢ are interchangeable in the intercept-only
    * random-effects likelihood (their λ-dependent weights are identical),
    * so collapsing to the size grain loses nothing — and bounds the
    * collected frame by the number of DISTINCT subject sizes, not the
    * number of subjects (10⁸⁺ at design scale).
    *
    * @param subjStats one row per (key, subject): (keyCol, n, s, ss).
    * @return one row per (key, n): k subjects of that size, Σs, Σs², Σss.
    */
  def sizeStats(subjStats: DataFrame, keyCol: String = "__key"): DataFrame =
    subjStats.groupBy(col(keyCol), col("n"))
      .agg(count(lit(1)).as("k"),
        sum("s").as("sum_s"),
        sum(col("s") * col("s")).as("sum_s2"),
        sum("ss").as("sum_ss"))

  /** One size class: k subjects with n rows each; sums of per-subject
    * residual sums / squared sums / sums of squares. */
  final case class SizeStat(n: Long, k: Long, sumS: Double, sumS2: Double, sumSS: Double)

  /** Exact profile REML for the intercept-only random-effects model on
    * residuals, r ~ N(μ1, σ²ₑ I + σ²_b Z Z') — the reference's PROC MIXED
    * default method=REML with `random intercept / subject=` slice
    * (longitudinalPlot.sas:423-442). Fixed effects beyond the residual
    * intercept are pre-removed by the OLS pass (deviation from PROC
    * MIXED's joint fit, documented per SURVEY §7.6.1).
    *
    * With λ = σ²_b/σ²ₑ and wₙ = 1/(1+nλ):
    *   μ̂(λ)  = Σ wₙ·sumSₙ / Σ wₙ·n·kₙ
    *   Q(λ)  = Σ [sumSSₙ − 2μ̂·sumSₙ + kₙn·μ̂²
    *              − λwₙ(sumS2ₙ − 2nμ̂·sumSₙ + kₙn²·μ̂²)]
    *   −2l_R(λ) ∝ (N−1)·log Q(λ) + Σ kₙ·log(1+nλ) + log(Σ wₙ·n·kₙ)
    * maximized by a coarse log-λ scan + golden-section refinement, with
    * the λ=0 boundary checked explicitly. σ̂²ₑ = Q(λ̂)/(N−1), σ̂²_b = λ̂σ̂²ₑ.
    * For balanced data this coincides with the ANOVA/MoM estimator when
    * MSB > MSW (classic equivalence) — property-tested.
    */
  /** The profiled restricted −2 log-likelihood at λ = σ²_b/σ²ₑ over the
    * size-class stats — the EXACT function the REML optimizer minimizes
    * (formula in the `remlFromSizeStats` doc above). Public so the driver
    * oracle can pin its arithmetic point-by-point against an independent
    * closed-form recomputation (q73): the optimizer's argmin is not
    * SQL-expressible, but the objective at fixed λ is. */
  def neg2lrProfile(stats: Seq[SizeStat], lambda: Double): Double = {
    val n = stats.map(s => s.n * s.k).sum
    var swS = 0.0; var swNK = 0.0
    stats.foreach { st =>
      val w = 1.0 / (1.0 + st.n * lambda)
      swS += w * st.sumS
      swNK += w * st.n * st.k
    }
    val mu = if (swNK > 0) swS / swNK else 0.0
    var q = 0.0; var logdet = 0.0
    stats.foreach { st =>
      val w = 1.0 / (1.0 + st.n * lambda)
      val centered = st.sumSS - 2 * mu * st.sumS + st.k * st.n * mu * mu
      val sq = st.sumS2 - 2 * st.n * mu * st.sumS + st.k * st.n.toDouble * st.n * mu * mu
      q += centered - lambda * w * sq
      logdet += st.k * math.log1p(st.n * lambda)
    }
    if (q <= 0) return Double.PositiveInfinity // numerically degenerate
    (n - 1) * math.log(q) + logdet + math.log(swNK)
  }

  def remlFromSizeStats(stats: Seq[SizeStat]): Estimate = {
    val k = stats.map(_.k).sum
    val n = stats.map(s => s.n * s.k).sum
    if (k == 0 || n == 0) return Estimate(Double.NaN, Double.NaN, k, n)
    if (n == k) {
      // all-singleton subjects: σ²_b unidentifiable → 0, MSW has 0 df —
      // matches the distributed MoM path (msw NaN when n == k). Computed
      // directly from the size-class sums: materializing one tuple per
      // subject here would put 10^8+ rows on the driver (and overflow
      // s.k.toInt), defeating the size-class guard.
      return Estimate(0.0, Double.NaN, k, n)
    }
    if (k == 1) {
      // one subject: σ²_b unidentifiable → 0; MSW = (Σr² − (Σr)²/n)/(n−1),
      // directly from the single size class (sumS2 = sumS² when k = 1).
      val s = stats.find(_.k > 0).get
      val msw = (s.sumSS - s.sumS2 / s.n) / (n - 1)
      return Estimate(0.0, msw, k, n)
    }
    def neg2lr(lambda: Double): Double = neg2lrProfile(stats, lambda)
    // coarse scan over log λ (plus the boundary), then golden-section
    val grid = 0.0 +: (-90 to 90).map(t => math.exp(t / 5.0))
    val best = grid.minBy(neg2lr)
    val lambdaHat =
      if (best == 0.0 && neg2lr(0.0) <= neg2lr(grid(1))) 0.0
      else {
        val i = grid.indexOf(best)
        var lo = grid(math.max(1, i - 1)); var hi = grid(math.min(grid.size - 1, i + 1))
        if (i == 1) lo = 1e-19
        val phi = (math.sqrt(5.0) - 1) / 2
        var a = math.log(lo); var b = math.log(hi)
        var c = b - phi * (b - a); var d = a + phi * (b - a)
        var fc = neg2lr(math.exp(c)); var fd = neg2lr(math.exp(d))
        var iter = 0
        while (b - a > 1e-10 && iter < 200) {
          if (fc < fd) { b = d; d = c; fd = fc; c = b - phi * (b - a); fc = neg2lr(math.exp(c)) }
          else { a = c; c = d; fc = fd; d = a + phi * (b - a); fd = neg2lr(math.exp(d)) }
          iter += 1
        }
        val cand = math.exp((a + b) / 2)
        if (neg2lr(0.0) < neg2lr(cand)) 0.0 else cand
      }
    // σ̂²ₑ from Q(λ̂)/(N−1)
    var swS = 0.0; var swNK = 0.0
    stats.foreach { st =>
      val w = 1.0 / (1.0 + st.n * lambdaHat)
      swS += w * st.sumS; swNK += w * st.n * st.k
    }
    val mu = if (swNK > 0) swS / swNK else 0.0
    var q = 0.0
    stats.foreach { st =>
      val w = 1.0 / (1.0 + st.n * lambdaHat)
      q += st.sumSS - 2 * mu * st.sumS + st.k * st.n * mu * mu -
        lambdaHat * w * (st.sumS2 - 2 * st.n * mu * st.sumS + st.k * st.n.toDouble * st.n * mu * mu)
    }
    val sigmaE2 = q / (n - 1)
    Estimate(lambdaHat * sigmaE2, sigmaE2, k, n)
  }

  /** Guard: max distinct subject sizes collected per key. ~48 bytes per
    * row driver-side — 200k sizes ≈ 10 MB, far beyond any real corpus's
    * distinct per-subject row counts. */
  val MaxSizes = 200000

  /** REML estimates per key, same output schema as `estimates` so callers
    * can swap methods. Distributed collapse to the (key, size) grain, then
    * a GUARDED collect (distinct sizes, not subjects) and driver-side
    * profile-likelihood optimization per key. */
  def remlEstimates(subjStats: DataFrame, keyCol: String = "__key"): DataFrame = {
    val spark = subjStats.sparkSession
    import spark.implicits._
    val rows = sizeStats(subjStats, keyCol)
      .select(col(keyCol).cast("string"), col("n"), col("k"),
        col("sum_s"), col("sum_s2"), col("sum_ss"))
      .limit(MaxSizes + 1)
      .as[(String, Long, Long, Double, Double, Double)]
      .collect()
    require(rows.length <= MaxSizes,
      s"remlEstimates: > $MaxSizes distinct (key, subject-size) classes; " +
        "use method=mom (fully distributed) for this input")
    val ests = rows.groupBy(_._1).toSeq.map { case (key, rs) =>
      val e = remlFromSizeStats(rs.toSeq.map(r => SizeStat(r._2, r._3, r._4, r._5, r._6)))
      (key, e.sigmaB2, e.sigmaE2, e.nSubjects, e.nRows)
    }
    ests.toDF(keyCol, "sigma_b2", "sigma_e2", "k_subjects", "n_rows")
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
