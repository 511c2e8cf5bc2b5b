package graft.stats

import graft.operators.OlsPass
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.commons.math3.linear.{Array2DRowRealMatrix, SingularValueDecomposition}

/** One feasible-GLS iteration for the random-intercept model — the step
  * that closes most of the gap to PROC MIXED's JOINT fixed-effect /
  * variance-component estimation on unbalanced data
  * (longitudinalPlot.sas:423-442). The engine's default fits β by OLS and
  * estimates (σ²_b, σ²_e) on the residuals; PROC MIXED alternates the two.
  * `refit` performs the alternation's β-update exactly:
  *
  *   β_gls = (X'V⁻¹X)⁻¹ X'V⁻¹y,   V_i⁻¹ = (1/σ²_e)(I − c_i·J),
  *   c_i = σ²_b / (σ²_e + n_i σ²_b)
  *
  * In sufficient statistics (the 1/σ²_e cancels):
  *
  *   X'V⁻¹X ∝ Σxx − Σ_i c_i (Σx_i)(Σx_i)'
  *   X'V⁻¹y ∝ Σxy − Σ_i c_i (Σx_i)(Σy_i)
  *
  * so ONE extra distributed pass suffices: aggregate (Σx, Σy, n) per
  * (scope, subject), weight by c(n_i) from the broadcast variance
  * components, collapse to one p²-row per scope, and solve the adjusted
  * normal equations on the driver — the same two-pass shape as OlsPass,
  * nothing subject- or row-proportional reaches the driver.
  *
  * With σ²_b = 0 every c_i = 0 and β_gls ≡ β_ols; for balanced data and an
  * intercept-only design the two coincide as well (equal weights) — both
  * property-tested.
  */
object Fgls {

  /** GLS β from adjusted normal equations; dfe/s² from the RAW statistics
    * at β_gls (marginal residual sum of squares — the cutoff role the
    * model operators need). */
  def solveGls(raw: OlsPass.RawStats, sxxAdj: Array[Double],
      sxyAdj: Array[Double]): Ols.Fit = {
    val p = sxyAdj.length
    val m = new Array2DRowRealMatrix(p, p)
    var i = 0
    while (i < p) {
      var j = 0
      while (j < p) { m.setEntry(i, j, sxxAdj(i * p + j)); j += 1 }
      i += 1
    }
    val svd = new SingularValueDecomposition(m)
    val smax = svd.getSingularValues.headOption.getOrElse(0.0)
    val tol = math.max(1e-10, smax * p * 1e-12)
    val rank = svd.getSingularValues.count(_ > tol)
    val inv = svd.getSolver.getInverse
    val beta = new Array[Double](p)
    i = 0
    while (i < p) {
      var acc = 0.0; var j = 0
      while (j < p) { acc += inv.getEntry(i, j) * sxyAdj(j); j += 1 }
      beta(i) = acc; i += 1
    }
    // SSE at β_gls against the RAW (unwhitened) sums
    var bxy = 0.0
    i = 0; while (i < p) { bxy += beta(i) * raw.sxy(i); i += 1 }
    var bxxb = 0.0
    i = 0
    while (i < p) {
      var j = 0
      while (j < p) { bxxb += beta(i) * raw.sxx(i * p + j) * beta(j); j += 1 }
      i += 1
    }
    val sse = math.max(0.0, raw.syy - 2 * bxy + bxxb)
    val dfe = (raw.n - rank).toDouble
    val s2 = if (dfe > 0) sse / dfe else Double.NaN
    val invArr = new Array[Double](p * p)
    i = 0
    while (i < p) {
      var j = 0
      while (j < p) { invArr(i * p + j) = inv.getEntry(i, j); j += 1 }
      i += 1
    }
    Ols.Fit(beta, invArr, raw.n, rank, dfe, s2)
  }

  /** The distributed pass + driver solve. `keyed` must be the
    * complete-cases frame with the `__key` scope column (OlsPass.withKey);
    * `est` is the per-scope variance-component frame
    * (__key, sigma_b2, sigma_e2, ...) from VarComp. */
  def refit(keyed: DataFrame, outcome: String, d: OlsPass.Design,
      subjCol: String, raw: Map[String, OlsPass.RawStats],
      est: DataFrame): Map[String, Ols.Fit] = {
    val p = d.p
    val xs = OlsPass.featureCols(d)
    val y = col(outcome).cast("double")
    // pass: subject-grain x/y sums (p + 2 aggregates, map-side partial)
    val subjSums = keyed
      .groupBy(col("__key"), col(subjCol).cast("string").as("__subj"))
      .agg(count(lit(1)).as("__n"),
        sum(y).as("__sy") +: xs.zipWithIndex.map { case (x, i) => sum(x).as(s"__sx_$i") }: _*)
    // weight by c(n_i) from the broadcast variance components, then
    // collapse to ONE row per scope (p² + p weighted outer-product sums)
    // guard BOTH components: a NaN sigma_b2 with a valid sigma_e2 would make
    // c NaN, and coalesce does not catch NaN — the whole adjusted Gram would
    // silently turn NaN. Invalid components fall back to c = 0 (plain OLS).
    val c = when(
      col("sigma_e2").isNotNull && !isnan(col("sigma_e2")) && col("sigma_e2") > 0 &&
        col("sigma_b2").isNotNull && !isnan(col("sigma_b2")) && col("sigma_b2") >= 0,
      col("sigma_b2") / (col("sigma_e2") + col("__n") * col("sigma_b2")))
      .otherwise(lit(0.0))
    val weighted = subjSums
      .join(broadcast(est.select("__key", "sigma_b2", "sigma_e2")), Seq("__key"), "left")
      .withColumn("__c", coalesce(c, lit(0.0)))
    val corrAggs =
      (for (i <- 0 until p; j <- i until p)
        yield sum(col("__c") * col(s"__sx_$i") * col(s"__sx_$j")).as(s"__wxx_${i}_$j")) ++
      (0 until p).map(i => sum(col("__c") * col(s"__sx_$i") * col("__sy")).as(s"__wxy_$i"))
    val collected = weighted.groupBy(col("__key"))
      .agg(corrAggs.head, corrAggs.tail: _*)
      .limit(OlsPass.MaxGroups + 1)
      .collect()
    require(collected.length <= OlsPass.MaxGroups,
      s"FGLS scope exceeds ${OlsPass.MaxGroups} groups")
    collected.flatMap { row =>
      val key = row.getString(0)
      raw.get(key).map { r =>
        val wxx = new Array[Double](p * p)
        var idx = 1
        for (i <- 0 until p; j <- i until p) {
          val v = row.getDouble(idx); idx += 1
          wxx(i * p + j) = v; wxx(j * p + i) = v
        }
        val wxy = Array.tabulate(p)(i => row.getDouble(idx + i))
        val sxxAdj = Array.tabulate(p * p)(k => r.sxx(k) - wxx(k))
        val sxyAdj = Array.tabulate(p)(i => r.sxy(i) - wxy(i))
        key -> solveGls(r, sxxAdj, sxyAdj)
      }
    }.toMap
  }
}
