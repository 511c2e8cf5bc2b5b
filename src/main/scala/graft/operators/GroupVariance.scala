package graft.operators

import graft.checks.{GroupVarianceCheck, Results}
import graft.stats.{Distributions, VarComp}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group-variance homogeneity check — %groupComparisons re-expressed.
  *
  * Reference flow (groupComparisons.sas): mixed-model scaled (vciry)
  * residuals (:393-401) → per comparison group-vs-rest, Brown-Forsythe
  * homogeneity test (PROC GLM hovtest=bf on the scaled residuals,
  * :461-470) → Holm (:472-476) → flag p < α (:576). The reference runs ONE
  * PROC per comparison — k full scans; here the one-vs-rest expansion is an
  * `explode` (A10) so all comparisons ride one lineage.
  *
  * BF = one-way ANOVA F on z = |r* − median(side)|. Medians are exact
  * (`percentile(0.5)`), computed per (scope, cmp, side) on the exploded
  * frame, then joined back broadcast.
  */
object GroupVariance {

  /** Whitened residuals per row (covariate-adjusted, random-intercept
    * variance components per scope, symmetric-root scaling — SURVEY M5). */
  def scaledResiduals(df: DataFrame, check: GroupVarianceCheck): DataFrame = {
    val d = OlsPass.design(df, check.contCovariates, check.discCovariates)
    val base = df.filter(col(check.groupCol).isNotNull)
    val fits = OlsPass.fitPerGroup(base, check.outcome, d, check.scope)
    val withResid = OlsPass.rowStats(base, check.outcome, d, check.scope, fits)
    val subjStats = withResid
      .groupBy(col("__key"), col(check.groupCol).cast("string").as("__grp"))
      .agg(count(lit(1)).as("n"), sum("resid").as("s"), sum(col("resid") * col("resid")).as("ss"))
      .collect()
    val est = subjStats.groupBy(_.getString(0)).map { case (k, rows) =>
      k -> VarComp.fromResidualStats(rows.map(r => (r.getLong(2), r.getDouble(3), r.getDouble(4))).toSeq)
    }
    val bcEst = df.sparkSession.sparkContext.broadcast(est)
    val whitenUdf = udf((key: String, n: Long, r: Double, rsum: Double) => {
      bcEst.value.get(key).map { e =>
        val (a, b) = VarComp.whitenCoeffs(e, n)
        a * r + b * rsum
      }.getOrElse(Double.NaN)
    })
    val wGrp = Window.partitionBy(col("__key"), col(check.groupCol))
    withResid
      .withColumn("__grp", col(check.groupCol).cast("string"))
      .withColumn("__n_grp", count(lit(1)).over(wGrp))
      .withColumn("__rsum", sum("resid").over(wGrp))
      .withColumn("rscaled", whitenUdf(col("__key"), col("__n_grp"), col("resid"), col("__rsum")))
  }

  /** Per-(scope, grp) Brown-Forsythe group-vs-rest results with Holm. */
  def tests(df: DataFrame, check: GroupVarianceCheck): DataFrame = {
    val r = scaledResiduals(df, check).select(col("__key"), col("__grp"), col("rscaled"))
    // groups per scope (driver-tiny, like the reference's distinct-into list
    // groupComparisons.sas:243-248)
    val groups = r.select(col("__key"), col("__grp")).distinct().collect()
      .groupBy(_.getString(0)).map { case (k, rows) => k -> rows.map(_.getString(1)).sorted.toSeq }
    val bcGroups = r.sparkSession.sparkContext.broadcast(groups)
    // one-vs-rest expansion: each row contributes to every comparison,
    // side=1 when it belongs to the compared group (A10 fused)
    val cmpUdf = udf((key: String) => bcGroups.value.getOrElse(key, Seq.empty[String]))
    val exploded = r
      .withColumn("cmp", explode(cmpUdf(col("__key"))))
      .withColumn("side", when(col("__grp") === col("cmp"), 1).otherwise(0))
    // skip scopes with a single group — no "rest" (groupComparisons.sas:264)
    val multi = exploded.filter(size(cmpUdf(col("__key"))) >= 2)
    val medians = multi.groupBy("__key", "cmp", "side")
      .agg(expr("percentile(rscaled, 0.5)").as("med"))
    val withZ = multi.join(broadcast(medians), Seq("__key", "cmp", "side"))
      .withColumn("z", abs(col("rscaled") - col("med")))
    val sideStats = withZ.groupBy("__key", "cmp", "side")
      .agg(count(lit(1)).as("n_s"), sum("z").as("sz"), sum(col("z") * col("z")).as("szz"))
    // two-sample one-way ANOVA F from side stats
    val perCmp = sideStats.groupBy("__key", "cmp").agg(
      sum("n_s").as("n"),
      sum("sz").as("sz_all"),
      collect_list(struct(col("side"), col("n_s"), col("sz"), col("szz"))).as("sides"))
    val fUdf = udf((n: Long, szAll: Double, sides: Seq[org.apache.spark.sql.Row]) => {
      if (sides.size != 2 || n <= 2) (Double.NaN, Double.NaN)
      else {
        val grand = szAll / n
        var ssb = 0.0; var ssw = 0.0
        sides.foreach { s =>
          val ns = s.getLong(1); val sz = s.getDouble(2); val szz = s.getDouble(3)
          val m = sz / ns
          ssb += ns * (m - grand) * (m - grand)
          ssw += szz - ns * m * m
        }
        val dfw = (n - 2).toDouble
        val f = if (ssw > 0) (ssb / 1.0) / (ssw / dfw) else Double.PositiveInfinity
        (f, Distributions.fPValue(f, 1.0, dfw))
      }
    })
    val withF = perCmp
      .withColumn("__fp", fUdf(col("n"), col("sz_all"), col("sides")))
      .withColumn("stat", col("__fp._1"))
      .withColumn("p_raw", col("__fp._2"))
      .drop("__fp", "sides", "sz_all")
    CategoricalConsistency.holmWithinPanel(withF, Seq("__key"))
  }

  def verdicts(df: DataFrame, check: GroupVarianceCheck): DataFrame = {
    val t = tests(df, check)
    val framed = t.select(
      concat_ws("/", col("__key"), concat(lit("grp="), col("cmp"))).as("partition"),
      lit("brown_forsythe_vs_rest").as("metric"),
      col("stat"),
      col("p_holm").as("p_value"),
      lit(check.alpha).as("threshold"),
      col("n").cast("long").as("n_obs"),
      (col("p_holm").isNaN || col("p_holm") >= check.alpha).as("pass"))
    Results.toVerdicts(framed, check.id, check.severity)
  }

  def violations(df: DataFrame, check: GroupVarianceCheck): DataFrame = {
    val t = tests(df, check).filter(!col("p_holm").isNaN && col("p_holm") < check.alpha)
    val v = t.select(
      col("cmp").as("key"),
      col("__key").as("partition"),
      concat(lit("BF F="), round(col("stat"), 4).cast("string")).as("observed"),
      lit("variance homogeneous with rest").as("expected"),
      concat(lit("heterogeneous variance, p_holm="),
        round(col("p_holm"), 6).cast("string")).as("label"))
    Results.toViolations(v, check.id)
  }
}
