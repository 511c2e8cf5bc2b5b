package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** General multi-term random-effects design — the full
  * `random INTERCEPT x1 x2 … / type=UN subject=id` surface of the
  * reference (longitudinalPlot.sas:49-51,128-129,436-440) for an
  * ARBITRARY term list, by the same Swamy-type two-stage method of
  * moments as the q = 2 special case (`RandomSlope`, which this
  * generalizes; RandomEffectsSpec pins the q = 2 equality).
  *
  * Model: r_ij = t_ij' u_i + e_ij with t_ij = (1, x1_ij, …) ∈ R^q,
  * u_i ~ N(0, G) unstructured q×q, e ~ N(0, σ²_e).
  *
  * Stage 1 (per subject, from ONE groupBy pass of packed sufficient
  * stats): OLS of the fixed-effect residual r on t → b_i, SSE_i, and
  * (T_i'T_i)⁻¹ — a bounded q×q Cholesky solve per SUBJECT row (the
  * reduced frame), never per input row. Stage 2 (per scope, one more
  * tiny agg): σ²_e = Σ SSE_i / Σ (n_i − q);  S = sample covariance of
  * b_i;  G = S − σ²_e · mean_i (T_i'T_i)⁻¹, projected to the PSD cone
  * by eigenvalue clamping (the q×q generalization of the q = 2 clamp
  * `g00,g11 ≥ 0, |g01| ≤ √(g00·g11)`; for q = 2 both projections keep
  * the same definiteness guarantee, RandomEffectsSpec pins PSD).
  *
  * Subjects with n_i ≤ q or a degenerate within-subject design (Cholesky
  * pivot under relative tolerance — e.g. a term constant within the
  * subject) carry no information about G and are excluded from
  * estimation; their rows still get scaled residuals from the pooled
  * components. Everything is distributed: per-subject sums collapse to
  * one row per scope before anything leaves the executors, and the only
  * non-codegen steps are two bounded UDFs on REDUCED frames (the q×q
  * solve per subject, the q×q eigen-clamp per scope).
  *
  * Scaled residuals use the marginal studentized form r/√V_jj with
  * V_jj = t'Ĝt + σ²_e — PROC MIXED's marginal student residual
  * diagonal, the same deviation class as the intercept-only whitening
  * (SURVEY §7.6(1)). Exact REML stays available for q ≤ 2
  * (`VarComp.remlEstimates`, `RandomSlope.remlEstimates`); for q > 2
  * the MoM is the (scale-default) estimator and `method=reml` is
  * normalized away by CheckCompiler with a warning.
  */
object RandomEffects {

  /** q×q solves ride a per-subject UDF; past this the packed stats row
    * itself stops being "tiny" and the design is almost surely
    * misspecified. */
  val MaxTerms = 7

  /** Packed upper-triangle length for a q×q symmetric matrix. */
  def triLen(q: Int): Int = q * (q + 1) / 2

  /** Row-major upper-triangle index of (a, b), a ≤ b, in a q×q matrix. */
  def triIdx(a: Int, b: Int, q: Int): Int =
    a * q - a * (a - 1) / 2 + (b - a)

  /** Per-(key, subject) packed sufficient statistics: n, upper-tri of
    * T'T, T'r, r'r — one codegen'd groupBy over the residual frame.
    * Term 0 is the implicit intercept. */
  def subjStats(frame: DataFrame, keyCol: String, subjCol: String,
      termCols: Seq[String], rCol: String): DataFrame = {
    require(termCols.nonEmpty && termCols.size <= MaxTerms,
      s"randomTerms size ${termCols.size} outside 1..$MaxTerms")
    val q = termCols.size + 1
    val t: Int => Column =
      i => if (i == 0) lit(1.0) else col(termCols(i - 1)).cast("double")
    val r = col(rCol).cast("double")
    val ttSums = for (a <- 0 until q; b <- a until q)
      yield sum(t(a) * t(b))
    val trSums = (0 until q).map(a => sum(t(a) * r))
    frame.groupBy(col(keyCol), col(subjCol))
      .agg(count(lit(1)).as("n"),
        array(ttSums: _*).as("tt"),
        array(trSums: _*).as("tr"),
        sum(r * r).as("srr"))
  }

  /** Cholesky of a packed symmetric matrix with a RELATIVE pivot
    * tolerance (so a degenerate subject lands in the excluded branch in
    * any arithmetic order). Returns null if not positive definite. */
  private def cholesky(tt: Array[Double], q: Int): Array[Array[Double]] = {
    val l = Array.ofDim[Double](q, q)
    var a = 0
    while (a < q) {
      var b = 0
      while (b <= a) {
        var s = tt(triIdx(math.min(a, b), math.max(a, b), q))
        var k = 0
        while (k < b) { s -= l(a)(k) * l(b)(k); k += 1 }
        if (a == b) {
          if (s <= 1e-12 * (math.abs(tt(triIdx(a, a, q))) + 1.0)) return null
          l(a)(a) = math.sqrt(s)
        } else l(a)(b) = s / l(b)(b)
        b += 1
      }
      a += 1
    }
    l
  }

  /** Solve A x = y given L (A = LL'). */
  private def cholSolve(l: Array[Array[Double]], y: Array[Double]): Array[Double] = {
    val q = l.length
    val z = new Array[Double](q)
    var i = 0
    while (i < q) {
      var s = y(i); var k = 0
      while (k < i) { s -= l(i)(k) * z(k); k += 1 }
      z(i) = s / l(i)(i); i += 1
    }
    val x = new Array[Double](q)
    i = q - 1
    while (i >= 0) {
      var s = z(i); var k = i + 1
      while (k < q) { s -= l(k)(i) * x(k); k += 1 }
      x(i) = s / l(i)(i); i -= 1
    }
    x
  }

  /** A⁻¹ (packed upper tri) from L by solving against unit vectors. */
  private def cholInverse(l: Array[Array[Double]], q: Int): Array[Double] = {
    val inv = new Array[Double](triLen(q))
    var b = 0
    while (b < q) {
      val e = new Array[Double](q); e(b) = 1.0
      val colB = cholSolve(l, e)
      var a = 0
      while (a <= b) { inv(triIdx(a, b, q)) = colB(a); a += 1 }
      b += 1
    }
    inv
  }

  /** Per-key Swamy estimates from the `subjStats` frame: one row per key
    * with (sigma_e2, g = packed PSD upper-tri, k3, k_subjects, n_rows).
    * NaN components when fewer than 2 informative subjects. */
  def estimates(stats: DataFrame, termCount: Int, keyCol: String = "__key"): DataFrame = {
    val q = termCount + 1
    val u = triLen(q)
    // stage 1: per-subject solve on the REDUCED frame —
    // flat output [ok, sse, b(q), vinv(u)]
    val solve = udf { (n: Long, tt: Seq[Double], tr: Seq[Double], srr: Double) =>
      val out = new Array[Double](2 + q + u)
      if (n > q && tt != null && !tt.exists(_.isNaN)) {
        val l = cholesky(tt.toArray, q)
        if (l != null) {
          val b = cholSolve(l, tr.toArray)
          var sse = srr
          var i = 0
          while (i < q) { sse -= b(i) * tr(i); i += 1 }
          out(0) = 1.0
          out(1) = sse
          System.arraycopy(b, 0, out, 2, q)
          System.arraycopy(cholInverse(l, q), 0, out, 2 + q, u)
        }
      }
      out
    }
    val per = stats.withColumn("__s", solve(col("n"), col("tt"), col("tr"), col("srr")))
    val ok = element_at(col("__s"), 1) > 0.5
    def s(i: Int): Column = element_at(col("__s"), i + 1) // 1-based
    def b(a: Int): Column = s(2 + a)
    def vinv(i: Int): Column = s(2 + q + i)
    val sbb = for (a <- 0 until q; c <- a until q)
      yield sum(when(ok, b(a) * b(c)).otherwise(0.0)).as(s"sbb_${triIdx(a, c, q)}")
    val aggCols = Seq(
      sum(col("n")).as("n_rows"),
      count(lit(1)).as("k_subjects"),
      sum(when(ok, 1L).otherwise(0L)).as("k3"),
      sum(when(ok, col("n") - q).otherwise(0L)).as("dfe"),
      sum(when(ok, s(1)).otherwise(0.0)).as("sse_sum"),
      array((0 until q).map(a => sum(when(ok, b(a)).otherwise(0.0))): _*).as("sb"),
      array((0 until u).map(i => sum(when(ok, vinv(i)).otherwise(0.0))): _*).as("svinv"),
      array(sbb: _*).as("sbb"))
    val agged = per.groupBy(col(keyCol)).agg(aggCols.head, aggCols.tail: _*)
    // stage 2: per-KEY closed form + PSD eigen-clamp (tiny frame)
    val finish = udf { (k3: Long, dfe: Long, sseSum: Double,
        sb: Seq[Double], sbb: Seq[Double], svinv: Seq[Double]) =>
      if (k3 < 2 || dfe <= 0) (Double.NaN, Seq.fill(u)(Double.NaN))
      else {
        val k = k3.toDouble
        val sigmaE2 = sseSum / dfe
        val graw = Array.ofDim[Double](q, q)
        for (a <- 0 until q; c <- a until q) {
          val i = triIdx(a, c, q)
          val sAC = (sbb(i) - sb(a) * sb(c) / k) / (k - 1)
          val g = sAC - sigmaE2 * svinv(i) / k
          graw(a)(c) = g; graw(c)(a) = g
        }
        // PSD projection: clamp negative eigenvalues to 0 (commons-math
        // symmetric eigendecomposition — the q×q matrix is tiny)
        import org.apache.commons.math3.linear.{Array2DRowRealMatrix, EigenDecomposition}
        val ed = new EigenDecomposition(new Array2DRowRealMatrix(graw))
        val vals = ed.getRealEigenvalues
        val vecs = (0 until q).map(ed.getEigenvector)
        val gpsd = Array.ofDim[Double](q, q)
        for (e <- 0 until q; if vals(e) > 0; a <- 0 until q; c <- 0 until q)
          gpsd(a)(c) += vals(e) * vecs(e).getEntry(a) * vecs(e).getEntry(c)
        val packed = for (a <- 0 until q; c <- a until q) yield gpsd(a)(c)
        (sigmaE2, packed)
      }
    }
    agged
      .withColumn("__f", finish(col("k3"), col("dfe"), col("sse_sum"),
        col("sb"), col("sbb"), col("svinv")))
      .select(col(keyCol),
        col("__f._1").as("sigma_e2"),
        col("__f._2").as("g"),
        col("k3"), col("k_subjects"), col("n_rows"))
  }

  /** Marginal variance V_jj = σ²_e + t'Ĝt as a column expression over the
    * joined (sigma_e2, g) estimate columns; term 0 is the intercept. */
  def marginalVar(termCols: Seq[String]): Column = {
    val q = termCols.size + 1
    val t: Int => Column =
      i => if (i == 0) lit(1.0) else col(termCols(i - 1)).cast("double")
    val quad = (for (a <- 0 until q; b <- a until q) yield {
      val coeff = if (a == b) lit(1.0) else lit(2.0)
      coeff * element_at(col("g"), triIdx(a, b, q) + 1) * t(a) * t(b)
    }).reduce(_ + _)
    col("sigma_e2") + quad
  }

  /** Marginal studentized residual r/√V_jj — NULL (never NaN) on
    * degenerate components, matching the slopeVar branch's flag-guard
    * convention (`RandomSlope.scaledResidual`). */
  def scaledResidual(rCol: Column, termCols: Seq[String]): Column = {
    val v = marginalVar(termCols)
    when(!isnan(v) && v > 0 && !isnan(rCol), rCol / sqrt(v))
  }
}
