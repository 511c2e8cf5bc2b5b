package graft.stats

import org.apache.commons.math3.distribution.ChiSquaredDistribution
import org.apache.commons.math3.linear.{Array2DRowRealMatrix, LUDecomposition}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unstructured (`type=UN`) within-subject covariance for slot-structured
  * panels — the PROC MIXED `repeated / type=UN` surface the random-intercept
  * default (VarComp) declares out of scope (longitudinalPlot.sas:423-442
  * options surface; SURVEY.md §7.6(1) deviation, narrowed here).
  *
  * Scope and method, stated exactly:
  *   - panels are COMPLETE-CASE: the covariance is estimated from (and
  *     subjects are scored on) subjects observed in every one of the T
  *     slots — the MANOVA-style estimator PROC GLM's repeated statement
  *     uses; incomplete subjects are the random-intercept path's job.
  *   - the fixed-effect model is the slot cell-means model (the
  *     longitudinal plot's visit-classified mean), under which GLS fixed
  *     effects equal the per-slot sample means for ANY Σ on balanced data,
  *     so "UN" changes only the covariance — estimated as the pooled
  *     cross-product of residual vectors, Σ̂ = Σᵢ rᵢ rᵢᵀ / (k − 1).
  *   - per-subject distance d²ᵢ = rᵢᵀ Σ̂⁻¹ rᵢ is compared to a χ²_T
  *     quantile (the large-k calibration; the exact (k−1)T/(k−T)·F small-k
  *     form is noted in the scaladoc of `cutoff`).
  *
  * Spark shape: slot means and residuals are column ops; the T×T pooled
  * cross-products come from ONE self-join on (key, subject) restricted to
  * slot1 ≤ slot2 (≤ T(T+1)/2 rows per subject, T capped at `MaxSlots`) and
  * ONE groupBy (key, slot1, slot2) — nothing subject-proportional reaches
  * the driver; only T² entries per scope key do.
  */
object UnCov {

  /** Hard cap on the slot dimension — T² drives the pair-explode factor
    * and the driver-side matrix; 32 keeps both trivially bounded. */
  val MaxSlots = 32

  /** Pooled cross-product entries per scope key from a complete-case panel
    * frame (one row per (key, subj, slot) with a residual column).
    *
    * @return one row per (key, slot1 ≤ slot2): (spp = Σ_subj r₁·r₂,
    *         k = subject count) — ≤ T(T+1)/2 rows per key.
    */
  def pooledCrossProducts(panel: DataFrame, keyCol: String, subjCol: String,
      slotCol: String, residCol: String): DataFrame = {
    val a = panel.select(col(keyCol).as("__k"), col(subjCol).as("__s"),
      col(slotCol).as("s1"), col(residCol).as("r1"))
    val b = panel.select(col(keyCol).as("__k"), col(subjCol).as("__s"),
      col(slotCol).as("s2"), col(residCol).as("r2"))
    a.join(b, Seq("__k", "__s"))
      .filter(col("s1") <= col("s2"))
      .groupBy(col("__k").as(keyCol), col("s1"), col("s2"))
      .agg(sum(col("r1") * col("r2")).as("spp"),
        count(lit(1)).as("k_subjects"))
  }

  /** Driver-side Σ̂ from the collected entries of ONE key: unbiased pooled
    * covariance (divisor k − 1 — residuals are from slot means estimated
    * on the same k subjects). Entries index into the dense slot order
    * 0..T-1 the caller derived. */
  def covMatrix(entries: Seq[(Int, Int, Double)], nSlots: Int, k: Long): Array[Array[Double]] = {
    val m = Array.ofDim[Double](nSlots, nSlots)
    val div = math.max(1L, k - 1L).toDouble
    entries.foreach { case (i, j, spp) =>
      m(i)(j) = spp / div
      m(j)(i) = spp / div
    }
    m
  }

  /** Inverse via LU with partial pivoting (commons-math3); null when the
    * matrix is singular (k ≤ T or degenerate residuals) — callers flag the
    * scope as not-evaluable rather than fabricating distances. */
  def invert(m: Array[Array[Double]]): Array[Array[Double]] =
    try {
      val lu = new LUDecomposition(new Array2DRowRealMatrix(m))
      if (math.abs(lu.getDeterminant) < Double.MinPositiveValue * 1e10) null
      else lu.getSolver.getInverse.getData
    } catch { case _: Exception => null }

  /** Mahalanobis distance d² = rᵀ Σ̂⁻¹ r of one subject's residual vector. */
  def mahalanobis(r: Array[Double], inv: Array[Array[Double]]): Double = {
    val t = r.length
    var acc = 0.0
    var i = 0
    while (i < t) {
      var j = 0
      while (j < t) { acc += r(i) * inv(i)(j) * r(j); j += 1 }
      i += 1
    }
    acc
  }

  /** χ²_T quantile cutoff for d² at `pct` percent (e.g. 99 → 0.99
    * quantile). This is the k→∞ calibration of the exact Hotelling form
    * d² ~ (k−1)T/(k−T) · F(T, k−T); at the reference's panel sizes the
    * difference is < the reporting precision, and χ² keeps the cutoff
    * independent of k (one cutoff per scope, broadcastable). */
  def chi2Inv(pct: Double, df: Int): Double =
    if (df <= 0 || pct <= 0 || pct >= 100) Double.NaN
    else new ChiSquaredDistribution(df.toDouble).inverseCumulativeProbability(pct / 100.0)
}
