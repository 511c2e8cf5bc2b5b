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
