package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Random intercept + slope variance components (PROC MIXED
  * `random INTERCEPT <var> / type=UN subject=id` — the reference's
  * `random=`/`type=` surface, longitudinalPlot.sas:49-51,128-129,436-440)
  * by the Swamy-type two-stage method of moments.
  *
  * Stage 1 (per subject, closed form from one groupBy pass): OLS of the
  * fixed-effect residual r on (1, t) → coefficients (aᵢ, cᵢ), SSEᵢ, and
  * (TᵢᵀTᵢ)⁻¹. Stage 2 (per scope, one more tiny agg):
  *
  *   σ²_e = Σ SSEᵢ / Σ (nᵢ − 2)            over subjects with nᵢ ≥ 3
  *   S    = sample covariance of (aᵢ, cᵢ)   across those subjects
  *   G    = S − σ²_e · mean_i (TᵢᵀTᵢ)⁻¹     (sampling-noise correction),
  *          clamped: diagonals ≥ 0, |g01| ≤ √(g00·g11)
  *
  * Subjects with nᵢ < 3 or a degenerate within-subject design
  * (det TᵢᵀTᵢ ≈ 0, e.g. constant t) carry no slope information and are
  * excluded from estimation; their rows still get scaled residuals from
  * the pooled components. Everything is distributed — per-subject sums
  * collapse to one row per scope before anything leaves the executors —
  * and every step is closed-form arithmetic (SQL-expressible, so the
  * driver query carries a full DuckDB oracle, unlike the REML path).
  *
  * Scaled residuals use the marginal (studentized) form r/√V_jj with
  * V_jj = g00 + 2·g01·t + g11·t² + σ²_e — PROC MIXED's marginal student
  * residual diagonal, the same deviation class as the random-intercept
  * whitening (SURVEY §7.6(1)).
  */
object RandomSlope {

  /** Per-(key, subject) sufficient statistics for the two-stage fit.
    *
    * @param frame rows with `keyCol`, `subjCol`, `tCol` (random-slope
    *              design variable), `rCol` (fixed-effect residual).
    * @return one row per (key, subject): n, st, stt, sr, srt, srr.
    */
  def subjStats(frame: DataFrame, keyCol: String, subjCol: String,
      tCol: String, rCol: String): DataFrame = {
    val t = col(tCol).cast("double")
    val r = col(rCol).cast("double")
    frame.groupBy(col(keyCol), col(subjCol))
      .agg(count(lit(1)).as("n"),
        sum(t).as("st"), sum(t * t).as("stt"),
        sum(r).as("sr"), sum(r * t).as("srt"), sum(r * r).as("srr"))
  }

  /** Stage 1 + stage 2: per-key (σ²_e, g00, g01, g11, k, n) from the
    * `subjStats` frame. One row per key — broadcast-joinable. */
  def estimates(stats: DataFrame, keyCol: String = "__key"): DataFrame = {
    val nan = lit(Double.NaN)
    // per-subject closed-form OLS of r on (1, t); det tolerance is
    // relative so a constant-t subject lands in the excluded branch in
    // ANY arithmetic order (Spark vs oracle)
    val det = col("n") * col("stt") - col("st") * col("st")
    val ok = col("n") >= 3 && det > lit(1e-12) * (abs(col("n") * col("stt")) + lit(1.0))
    val a = (col("stt") * col("sr") - col("st") * col("srt")) / col("det")
    val c = (col("n") * col("srt") - col("st") * col("sr")) / col("det")
    val perSubj = stats
      .withColumn("det", det)
      .withColumn("ok", ok)
      .withColumn("a", when(col("ok"), a).otherwise(nan))
      .withColumn("c", when(col("ok"), c).otherwise(nan))
      .withColumn("sse",
        when(col("ok"), col("srr") - col("a") * col("sr") - col("c") * col("srt")).otherwise(nan))
    val agged = perSubj.groupBy(col(keyCol)).agg(
      sum("n").as("n_rows"),
      count(lit(1)).as("k_subjects"),
      sum(when(col("ok"), 1L).otherwise(0L)).as("k3"),
      sum(when(col("ok"), col("n") - 2).otherwise(0L)).as("dfe"),
      sum(when(col("ok"), col("sse")).otherwise(0.0)).as("sse_sum"),
      sum(when(col("ok"), col("a")).otherwise(0.0)).as("sa"),
      sum(when(col("ok"), col("c")).otherwise(0.0)).as("sc"),
      sum(when(col("ok"), col("a") * col("a")).otherwise(0.0)).as("saa"),
      sum(when(col("ok"), col("c") * col("c")).otherwise(0.0)).as("scc"),
      sum(when(col("ok"), col("a") * col("c")).otherwise(0.0)).as("sac"),
      // Σ (TᵀT)⁻¹ entries: [[stt, −st], [−st, n]] / det
      sum(when(col("ok"), col("stt") / col("det")).otherwise(0.0)).as("sv00"),
      sum(when(col("ok"), -col("st") / col("det")).otherwise(0.0)).as("sv01"),
      sum(when(col("ok"), col("n") / col("det")).otherwise(0.0)).as("sv11"))
    val k = col("k3").cast("double")
    val sigmaE2 = when(col("dfe") > 0, col("sse_sum") / col("dfe")).otherwise(nan)
    val est = agged
      .withColumn("sigma_e2", sigmaE2)
      .withColumn("s00", when(k > 1, (col("saa") - col("sa") * col("sa") / k) / (k - 1)).otherwise(nan))
      .withColumn("s11", when(k > 1, (col("scc") - col("sc") * col("sc") / k) / (k - 1)).otherwise(nan))
      .withColumn("s01", when(k > 1, (col("sac") - col("sa") * col("sc") / k) / (k - 1)).otherwise(nan))
      // k > 1 guard: k = 0 would divide by zero (an ANSI-mode task failure,
      // not an IEEE NaN) the moment a scope has no informative subjects
      .withColumn("g00", when(k > 1,
        greatest(col("s00") - col("sigma_e2") * col("sv00") / k, lit(0.0))).otherwise(nan))
      .withColumn("g11", when(k > 1,
        greatest(col("s11") - col("sigma_e2") * col("sv11") / k, lit(0.0))).otherwise(nan))
      .withColumn("g01raw", when(k > 1,
        col("s01") - col("sigma_e2") * col("sv01") / k).otherwise(nan))
      .withColumn("g01",
        signum(col("g01raw")) * least(abs(col("g01raw")), sqrt(col("g00") * col("g11"))))
    est.select(col(keyCol),
      col("sigma_e2"), col("g00"), col("g01"), col("g11"),
      col("k_subjects"), col("k3"), col("n_rows"))
  }

  /** One design class for exact REML: k subjects sharing the 2×2
    * within-subject design A = TᵀT = [[n, st],[st, stt]], with the
    * class-summed data moments Σw (w = Tᵀr), Σwwᵀ, and Σrᵀr. Subjects
    * with the same design are interchangeable in the likelihood (their
    * V-dependent weights coincide), so collapsing to this grain bounds
    * the collected frame by DISTINCT designs, not subjects — balanced
    * panels collapse to a handful of rows (the VarComp.sizeStats
    * precedent, generalized from nᵢ to (nᵢ, Σt, Σt²)). */
  final case class DesignClass(n: Long, st: Double, stt: Double, k: Long,
      sw0: Double, sw1: Double, sww00: Double, sww01: Double, sww11: Double,
      sq: Double)

  /** Exact REML for the intercept+slope model on residuals,
    * rᵢ ~ N(Tᵢδ, σ²ₑI + Tᵢ G Tᵢᵀ) with unstructured 2×2 G — the
    * `slopeMethod = reml` counterpart of the Swamy two-stage `estimates`
    * (PROC MIXED `random INTERCEPT t / type=UN` default method parity,
    * longitudinalPlot.sas:436-440). δ is a 2-vector fixed effect kept on
    * the residuals (≈ 0 by construction) so the restricted likelihood has
    * the standard X'V⁻¹X correction — the same convention as
    * VarComp.remlFromSizeStats keeping μ.
    *
    * With G = LLᵀ (Cholesky, PSD by construction) and per class
    * D = σ²I₂ + LᵀAL, C = L D⁻¹ Lᵀ:
    *   Σ log|Vᵢ|    = Σ k·(n·log σ² + log(det D / σ⁴))
    *   Σ rᵀV⁻¹r     = σ⁻²(Σq − tr(C·Σwwᵀ))
    *   M = ΣTᵀV⁻¹T  = σ⁻² Σ k·(A − A C A),  m = ΣTᵀV⁻¹r = σ⁻²(I − AC)Σw
    *   −2l_R = Σ log|Vᵢ| + log det M + (Σ rᵀV⁻¹r − δ̂ᵀm),  δ̂ = M⁻¹m
    * minimized by deterministic Nelder–Mead over (log σ², l00, l10, l11),
    * initialized at the Swamy MoM solution. Unlike the two-stage method,
    * ALL subjects enter the likelihood (nᵢ < 3 subjects still inform
    * g00 + σ² — PROC MIXED semantics); k3 reports the informative count
    * for schema parity with `estimates`.
    */
  def remlFromClasses(classes: Seq[DesignClass], mom: Array[Double]): Array[Double] = {
    import org.apache.commons.math3.optim.nonlinear.scalar.noderiv.{NelderMeadSimplex, SimplexOptimizer}
    import org.apache.commons.math3.optim.nonlinear.scalar.{GoalType, ObjectiveFunction}
    import org.apache.commons.math3.optim.{InitialGuess, MaxEval, SimpleValueChecker}
    // mom = Array(sigma_e2, g00, g01, g11) — the initial guess (NaN-safe).
    def neg2lr(x: Array[Double]): Double = {
      val s2 = math.exp(x(0))
      val l00 = x(1); val l10 = x(2); val l11 = x(3)
      // G = LL' entries
      val g00 = l00 * l00; val g01 = l00 * l10; val g11 = l10 * l10 + l11 * l11
      var logdet = 0.0; var quad = 0.0
      var m00 = 0.0; var m01 = 0.0; var m11 = 0.0
      var v0 = 0.0; var v1 = 0.0
      classes.foreach { cl =>
        val a00 = cl.n.toDouble; val a01 = cl.st; val a11 = cl.stt
        // B = L'AL
        val b00 = l00 * (a00 * l00 + a01 * l10) + l10 * (a01 * l00 + a11 * l10)
        val b01 = l00 * (a00 * 0 + a01 * l11) + l10 * (a01 * 0 + a11 * l11)
        val b11 = l11 * a11 * l11
        // D = s2 I + B; C = L D^-1 L'
        val d00 = s2 + b00; val d01 = b01; val d11 = s2 + b11
        val detD = d00 * d11 - d01 * d01
        if (detD <= 0) return Double.PositiveInfinity
        val di00 = d11 / detD; val di01 = -d01 / detD; val di11 = d00 / detD
        // C = L Dinv L' with L = [[l00,0],[l10,l11]]
        val c00 = l00 * di00 * l00
        val c01 = l00 * (di00 * l10 + di01 * l11)
        val c11 = l10 * (di00 * l10 + di01 * l11) + l11 * (di01 * l10 + di11 * l11)
        logdet += cl.k * (cl.n * math.log(s2) + math.log(detD / (s2 * s2)))
        // quad: (sq - tr(C * Sww)) / s2
        quad += (cl.sq - (c00 * cl.sww00 + 2 * c01 * cl.sww01 + c11 * cl.sww11)) / s2
        // AC and A - A C A (symmetric)
        val ac00 = a00 * c00 + a01 * c01; val ac01 = a00 * c01 + a01 * c11
        val ac10 = a01 * c00 + a11 * c01; val ac11 = a01 * c01 + a11 * c11
        val aca00 = ac00 * a00 + ac01 * a01
        val aca01 = ac00 * a01 + ac01 * a11
        val aca11 = ac10 * a01 + ac11 * a11
        m00 += cl.k * (a00 - aca00) / s2
        m01 += cl.k * (a01 - aca01) / s2
        m11 += cl.k * (a11 - aca11) / s2
        // (I - AC) Σw / s2
        v0 += ((1 - ac00) * cl.sw0 - ac01 * cl.sw1) / s2
        v1 += (-ac10 * cl.sw0 + (1 - ac11) * cl.sw1) / s2
      }
      val detM = m00 * m11 - m01 * m01
      if (detM <= 0 || !java.lang.Double.isFinite(detM)) return Double.PositiveInfinity
      val d0 = (m11 * v0 - m01 * v1) / detM
      val d1 = (m00 * v1 - m01 * v0) / detM
      val out = logdet + math.log(detM) + (quad - (d0 * v0 + d1 * v1))
      if (java.lang.Double.isFinite(out)) out else Double.PositiveInfinity
    }
    val s2i = if (mom(0) > 0 && !mom(0).isNaN) mom(0) else 1.0
    val eps = 1e-8 * s2i
    val g00i = if (!mom(1).isNaN && mom(1) > eps) mom(1) else eps
    val l00i = math.sqrt(g00i)
    val l10i = if (!mom(2).isNaN) mom(2) / l00i else 0.0
    val g11i = if (!mom(3).isNaN && mom(3) - l10i * l10i > eps) mom(3) - l10i * l10i else eps
    val l11i = math.sqrt(g11i)
    val x0 = Array(math.log(s2i), l00i, l10i, l11i)
    val step0 = Array(0.3, math.max(0.1 * l00i, 1e-4), math.max(0.1 * math.abs(l10i), 1e-4),
      math.max(0.1 * l11i, 1e-4))
    // restarted Nelder–Mead: the likelihood is near-flat in G when the
    // between-subject signal is weak (σ²_b ≪ σ²ₑ), where a single simplex
    // run can collapse and trigger the value checker ~1e-3 short of the
    // optimum (measured on the events fixture: one run stops at
    // −2l_R + 1.7e-3 with g00 3% off). Re-seeding a FRESH simplex at the
    // incumbent with shrinking steps is the standard deterministic fix.
    var x = x0
    var best = Double.PositiveInfinity
    var r = 0
    while (r < 3) {
      val step = step0.map(s => s * math.pow(0.25, r))
      val opt = new SimplexOptimizer(new SimpleValueChecker(1e-13, 1e-13))
      val res = opt.optimize(new MaxEval(20000), new ObjectiveFunction(neg2lr _),
        GoalType.MINIMIZE, new InitialGuess(x), new NelderMeadSimplex(step))
      if (res.getValue < best) { best = res.getValue; x = res.getPoint }
      r += 1
    }
    val s2 = math.exp(x(0))
    val g00 = x(1) * x(1); val g01 = x(1) * x(2); val g11 = x(2) * x(2) + x(3) * x(3)
    Array(s2, g00, g01, g11, best)
  }

  /** REML estimates per key, same output schema as `estimates` so the
    * operators can swap methods (`LongitudinalOutlierCheck.method` with
    * `slopeVar` set). Distributed collapse to the (key, design-class)
    * grain, then a GUARDED collect (VarComp.MaxSizes distinct classes,
    * not subjects) and driver-side REML per key, initialized at the
    * distributed MoM solution. Scopes with < 2 informative subjects fall
    * back to the MoM row (components unidentifiable either way). */
  def remlEstimates(stats: DataFrame, keyCol: String = "__key"): DataFrame =
    remlEstimatesWithObjective(stats, keyCol).drop("neg2lr")

  /** `remlEstimates` plus the achieved restricted −2 log-likelihood
    * (`neg2lr`, the dense-equivalent objective at the returned point;
    * NaN on the MoM-fallback rows). Exposed because the G entries are
    * only weakly identified when σ²_G ≪ σ²ₑ — on the sf0.01 events
    * fixture two converged optimizers differ 3.4× in g00 while their
    * −2l_R differs by 1.3e-3 against a G=0-to-optimum span of just 0.54
    * — so optimality oracles (q69) must compare the OBJECTIVE, not ridge
    * coordinates. */
  def remlEstimatesWithObjective(stats: DataFrame, keyCol: String = "__key"): DataFrame = {
    val spark = stats.sparkSession
    import spark.implicits._
    val momRows = estimates(stats, keyCol)
      .select(col(keyCol).cast("string"), col("sigma_e2"), col("g00"), col("g01"),
        col("g11"), col("k_subjects"), col("k3"), col("n_rows"))
      .as[(String, Double, Double, Double, Double, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val classRows = stats.groupBy(col(keyCol).cast("string").as("__k"),
        col("n"), col("st"), col("stt"))
      .agg(count(lit(1)).as("k"),
        sum("sr").as("sw0"), sum("srt").as("sw1"),
        sum(col("sr") * col("sr")).as("sww00"),
        sum(col("sr") * col("srt")).as("sww01"),
        sum(col("srt") * col("srt")).as("sww11"),
        sum("srr").as("sq"))
      .limit(VarComp.MaxSizes + 1)
      .as[(String, Long, Double, Double, Long, Double, Double, Double, Double, Double, Double)]
      .collect()
    require(classRows.length <= VarComp.MaxSizes,
      s"RandomSlope.remlEstimates: > ${VarComp.MaxSizes} distinct (key, design) " +
        "classes; use method=mom (fully distributed) for this input")
    val out = classRows.groupBy(_._1).toSeq.map { case (key, rs) =>
      val (_, momS2, momG00, momG01, momG11, kSubj, k3, nRows) =
        momRows.getOrElse(key, (key, Double.NaN, Double.NaN, Double.NaN, Double.NaN, 0L, 0L, 0L))
      if (k3 < 2)
        (key, momS2, momG00, momG01, momG11, Double.NaN, kSubj, k3, nRows)
      else {
        val classes = rs.map(r =>
          DesignClass(r._2, r._3, r._4, r._5, r._6, r._7, r._8, r._9, r._10, r._11)).toSeq
        val e = remlFromClasses(classes, Array(momS2, momG00, momG01, momG11))
        (key, e(0), e(1), e(2), e(3), e(4), kSubj, k3, nRows)
      }
    }
    out.toDF(keyCol, "sigma_e2", "g00", "g01", "g11", "neg2lr", "k_subjects", "k3", "n_rows")
  }

  /** Marginal studentized residual: r / √(g00 + 2·g01·t + g11·t² + σ²_e)
    * — the diagonal of V for the intercept+slope model. NaN components or
    * a non-positive variance yield NULL, never NaN: Spark orders NaN above
    * every double, so a NaN residual would satisfy `abs(r*) >= cutoff` and
    * silently flag every row of a degenerate scope (< 2 informative
    * subjects). NULL comparisons yield NULL and the callers'
    * `coalesce(flag, false)` lands on false, matching the py-oracle's
    * `~isnan` convention (tools/pyoracles.py). */
  def scaledResidual(rCol: org.apache.spark.sql.Column, tCol: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val v = col("g00") + lit(2.0) * col("g01") * tCol + col("g11") * tCol * tCol + col("sigma_e2")
    when(!isnan(v) && v > 0 && !isnan(rCol), rCol / sqrt(v))
  }
}
