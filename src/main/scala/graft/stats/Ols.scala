package graft.stats

import org.apache.commons.math3.linear.{Array2DRowRealMatrix, SingularValueDecomposition}

/** Closed-form OLS from distributed sufficient statistics.
  *
  * Replaces the reference's PROC GLM outputs (univariatePlot.sas:309-324,
  * BivariatePlot.sas:426-443): studentized deleted residuals (RSTUDENT),
  * leverage (H), Cook's distance (COOKD) and the error degrees of freedom
  * from the overallANOVA table (univariatePlot.sas:320-323).
  *
  * Two-pass Spark shape (see operators.RegressionOutlier):
  *   pass 1: groupBy(byCols).agg(n, Σy, Σy², Σxᵢy, Σxᵢxⱼ) — codegen'd
  *           declarative sums, one shuffle, KB-sized result per group;
  *   driver: solve the tiny normal equations here (pseudo-inverse, so
  *           rank-deficient one-hot designs behave like SAS's g2 inverse);
  *   pass 2: broadcast (β, (XᵀX)⁺, s², dfe) back, per-row closed-form
  *           residual statistics — no second shuffle.
  */
object Ols {

  /** Fitted group model: everything pass 2 needs, kept tiny for broadcast. */
  final case class Fit(
      beta: Array[Double],      // p coefficients
      xtxInv: Array[Double],    // p*p row-major pseudo-inverse of X'X
      n: Long,
      rank: Int,
      dfe: Double,              // n - rank  (error DF, SURVEY M3)
      s2: Double                // SSE / dfe (MSE)
  ) {
    def p: Int = beta.length
  }

  /** Solve from sufficient statistics.
    *
    * @param n     row count
    * @param sy    Σ y
    * @param syy   Σ y²
    * @param sxy   Σ xᵢ·y            (length p)
    * @param sxx   Σ xᵢ·xⱼ row-major (length p*p, symmetric)
    */
  def solve(n: Long, sy: Double, syy: Double, sxy: Array[Double], sxx: Array[Double]): Fit = {
    val p = sxy.length
    require(sxx.length == p * p, s"sxx must be $p x $p")
    val xtx = new Array2DRowRealMatrix(p, p)
    var i = 0
    while (i < p) { var j = 0; while (j < p) { xtx.setEntry(i, j, sxx(i * p + j)); j += 1 }; i += 1 }
    val svd = new SingularValueDecomposition(xtx)
    // rank with a relative tolerance like SAS GLM's sweep
    val smax = svd.getSingularValues.headOption.getOrElse(0.0)
    val tol = math.max(1e-10, smax * p * 1e-12)
    val rank = svd.getSingularValues.count(_ > tol)
    val xtxInv = svd.getSolver.getInverse // pseudo-inverse when singular
    val beta = new Array[Double](p)
    i = 0
    while (i < p) {
      var acc = 0.0; var j = 0
      while (j < p) { acc += xtxInv.getEntry(i, j) * sxy(j); j += 1 }
      beta(i) = acc; i += 1
    }
    // SSE = y'y - 2 b'X'y + b'X'X b  (robust under pseudo-inverse)
    var bxy = 0.0; i = 0; while (i < p) { bxy += beta(i) * sxy(i); i += 1 }
    var bxxb = 0.0
    i = 0
    while (i < p) { var j = 0; while (j < p) { bxxb += beta(i) * sxx(i * p + j) * beta(j); j += 1 }; i += 1 }
    val sse = math.max(0.0, syy - 2 * bxy + bxxb)
    val dfe = (n - rank).toDouble
    val s2 = if (dfe > 0) sse / dfe else Double.NaN
    val inv = new Array[Double](p * p)
    i = 0
    while (i < p) { var j = 0; while (j < p) { inv(i * p + j) = xtxInv.getEntry(i, j); j += 1 }; i += 1 }
    Fit(beta, inv, n, rank, dfe, s2)
  }

  /** Per-row statistics given a fitted group model. Returns
    * (residual, leverage h, rStudent, cookD). Pure — callable from a UDF.
    */
  def rowStats(fit: Fit, x: Array[Double], y: Double): (Double, Double, Double, Double) = {
    val p = fit.p
    var yhat = 0.0
    var i = 0
    while (i < p) { yhat += x(i) * fit.beta(i); i += 1 }
    val e = y - yhat
    // h = x' (X'X)^+ x
    var h = 0.0
    i = 0
    while (i < p) {
      var acc = 0.0; var j = 0
      while (j < p) { acc += fit.xtxInv(i * p + j) * x(j); j += 1 }
      h += x(i) * acc; i += 1
    }
    h = math.min(math.max(h, 0.0), 1.0 - 1e-12)
    val oneMinusH = 1.0 - h
    // deleted variance s(i)² = (dfe·s² − e²/(1−h)) / (dfe − 1)  — SAS RSTUDENT
    val rstudent =
      if (fit.dfe <= 1 || fit.s2.isNaN) Double.NaN
      else {
        val s2i = (fit.dfe * fit.s2 - e * e / oneMinusH) / (fit.dfe - 1)
        if (s2i <= 0) Double.NaN else e / math.sqrt(s2i * oneMinusH)
      }
    val cookd =
      if (fit.s2.isNaN || fit.s2 <= 0) Double.NaN
      else e * e * h / (fit.rank * fit.s2 * oneMinusH * oneMinusH)
    (e, h, rstudent, cookd)
  }
}
