package graft.operators

import graft.engine.CacheTracker.TrackedCacheOps
import graft.checks.{GroupVarianceCheck, Results}
import graft.stats.{Distributions, KllSketchAgg, VarComp}
import org.apache.spark.sql.DataFrame
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
  * BF = one-way ANOVA F on z = |r* − median(side)|. Medians come from
  * per-group mergeable KLL sketches (ONE un-exploded pass; exact until
  * compaction — see `SketchK`): side=1 reads the group's own sketch,
  * side=0 merges the complement's sketches on the k²-row reduced frame,
  * and both join back broadcast into the single exploded pass.
  */
object GroupVariance {

  /** Whitened residuals per row (covariate-adjusted, random-intercept
    * variance components per scope, symmetric-root scaling — SURVEY M5). */
  def scaledResiduals(df: DataFrame, check: GroupVarianceCheck): DataFrame = {
    val d = OlsPass.design(df, check.contCovariates, check.discCovariates)
    val base = df.filter(col(check.groupCol).isNotNull)
    val rawFits = OlsPass.fitPerGroupRaw(base, check.outcome, d, check.scope)
    // per-(scope, group) sufficient stats → variance components per scope,
    // entirely distributed (round-1 fix: no group-proportional collect);
    // whitening is column arithmetic over the broadcast-joined estimates.
    def subjStatsOf(fr: DataFrame) = fr
      .groupBy(col("__key"), col(check.groupCol).cast("string").as("__grp"))
      .agg(count(lit(1)).as("n"), sum("resid").as("s"), sum(col("resid") * col("resid")).as("ss"))
    // method="reml" mirrors LongitudinalOutlier: exact profile REML (the
    // PROC MIXED default the reference's vciry residuals come from); MoM
    // stays the fully distributed scale default — same output schema.
    def estOf(ss: DataFrame) =
      if (check.method.equalsIgnoreCase("reml")) VarComp.remlEstimates(ss)
      else VarComp.estimates(ss)
    val olsFits = rawFits.map { case (k, (_, f)) => k -> f }
    val withResid0 = OlsPass.rowStats(base, check.outcome, d, check.scope, olsFits)
    // the per-(scope, group) sufficient-stats frame is TINY (one row per
    // group) and serves BOTH consumers below — the variance-component
    // estimate AND the per-group (count, residual-sum) whitening join —
    // which used to be two separate full-table aggregations over the same
    // rows (round-6: cache it, one aggregation pass instead of two).
    val ss0 = subjStatsOf(withResid0).trackedCache()
    val est0 = estOf(ss0)
    // fgls: β re-estimated by GLS under est0, residuals + components
    // recomputed — one joint-estimation alternation (groupComparisons.sas
    // inherits PROC MIXED's joint fit through the vciry residuals)
    val (withResid, subjStats, est) =
      if (!check.fgls) (withResid0, ss0, est0)
      else {
        val keyed = OlsPass.withKey(base, check.outcome, d, check.scope)
        val glsFits = graft.stats.Fgls.refit(keyed, check.outcome, d,
          check.groupCol, rawFits.map { case (k, (r, _)) => k -> r }, est0)
        val wr = OlsPass.rowStats(base, check.outcome, d, check.scope, glsFits)
        val ssW = subjStatsOf(wr).trackedCache()
        (wr, ssW, estOf(ssW))
      }
    // per-group count/residual-sum via a broadcast join of the CACHED
    // stats frame, NOT a Window.partitionBy (the window plans a full
    // shuffle-SORT of the row-proportional frame) and NOT a second
    // aggregation (the stats frame already carries exactly these sums).
    // `base` filters null groups, so the equi-join keeps every row.
    val withGrp = withResid.withColumn("__grp", col(check.groupCol).cast("string"))
    val grpStats = subjStats.select(col("__key"), col("__grp"),
      col("n").as("__n_grp"), col("s").as("__rsum"))
    withGrp
      .join(broadcast(grpStats), Seq("__key", "__grp"))
      .join(broadcast(est), Seq("__key"), "left")
      .withColumn("rscaled", VarComp.whitenExpr(col("__n_grp"), col("resid"), col("__rsum")))
      .drop("sigma_b2", "sigma_e2", "k_subjects", "n_rows")
  }

  /** KLL parameter for the per-group median sketches: exact while a
    * group's residuals fit the sketch un-compacted (covers every golden
    * fixture and the oracle scales), normalized rank error ≲ 0.03% once
    * compaction starts (SURVEY M6 allows approx medians at this grain; the
    * q49 py-oracle compares at rtol 5e-3). Chosen over percentile_approx
    * because KLL partials MERGE: the "rest" side's median comes from
    * combining the k−1 complement groups' sketches on the k²-row reduced
    * frame instead of re-aggregating the k×n exploded frame. */
  val SketchK = 16384

  /** Per-(scope, grp) Brown-Forsythe group-vs-rest results with Holm. */
  def tests(df: DataFrame, check: GroupVarianceCheck): DataFrame = {
    // cache the narrow (scope, grp, rscaled) frame: it feeds TWO branches
    // of this plan (the per-group sketch pass and the exploded z-score
    // pass) and Catalyst does not materialize common subplans — uncached,
    // the whole OLS + whitening pipeline would execute twice. The reference
    // materializes the vciry residual dataset before PROC GLM
    // (groupComparisons.sas:393-401); MEMORY_AND_DISK spills at scale.
    val r = scaledResiduals(df, check)
      .select(col("__key"), col("__grp"), col("rscaled")).trackedCache()
    // ONE un-exploded pass: per-(scope, group) mergeable KLL sketch. This
    // frame is tiny (one row per group) and REPLACES both the old distinct
    // pass (the comparison domain is its key set) and the old exploded
    // medians pass (side medians fall out of sketch merges below) —
    // leaving a single k×n pass (sideStats) over the cached residuals.
    val perGrp = r.groupBy(col("__key"), col("__grp"))
      .agg(KllSketchAgg.sketch(col("rscaled"), SketchK).as("__sk"))
      .trackedCache()
    // comparison domain: distinct (scope, group), kept distributed and
    // broadcast-joined (round-1 fix: no driver collect; the reference's
    // distinct-into list, groupComparisons.sas:243-248, is a driver array).
    // Scopes with a single group have no "rest" → dropped here
    // (groupComparisons.sas:264).
    val kPerKey = perGrp.groupBy("__key").agg(count(lit(1)).as("__kgrp"))
    val dom = perGrp.select(col("__key"), col("__grp").as("cmp"))
      .join(broadcast(kPerKey), "__key").filter(col("__kgrp") >= 2).drop("__kgrp")
    // side medians on the k²-row reduced frame: side=1 reads the group's
    // own sketch, side=0 merges the k−1 complement sketches — no pass over
    // the row-proportional frame at all
    val medUdf = udf((sks: Seq[Array[Byte]]) =>
      KllSketchAgg.quantiles(KllSketchAgg.merge(sks, SketchK), Array(0.5))(0))
    // round-6 fusion: the old medians → medWide → grpMeds chain was THREE
    // reduced-frame aggregations + two joins; both sides of a comparison
    // now aggregate in ONE groupBy(key, cmp) (conditional collect_list —
    // nulls are skipped, so med1 sees exactly the group's own sketch and
    // med0 the complement merge, as before), and the per-group median
    // vector is a broadcast MAP over the per-key array instead of a third
    // aggregation exchange. Same values: sort_array orders by the unique
    // cmp exactly as the old struct(cmp, med) sort did.
    val medWide = perGrp.join(broadcast(dom), Seq("__key"))
      .withColumn("__own", col("__grp") === col("cmp"))
      .groupBy("__key", "cmp")
      .agg(medUdf(collect_list(when(col("__own"), col("__sk")))).as("med1"),
        medUdf(collect_list(when(!col("__own"), col("__sk")))).as("med0"))
    // one-vs-rest WITHOUT the explode (round-4 shape): each row of group h
    // needs |r − m| against k different side medians (side=1's own median
    // when c = h, side=0's rest median otherwise) — but that whole median
    // VECTOR is constant per (scope, group), so it rides in as ONE ordered
    // array on the tiny per-group frame and the k-length loop runs inside
    // a mergeable typed-imperative aggregate (stats.AbsDevSumsAgg). The
    // row-proportional frame is read ONCE at 1× — the previous
    // broadcast-join explode materialized k× rows through two hash probes
    // per comparison, the dominant suite cost at 100 M pages.
    val medArr = medWide.groupBy(col("__key"))
      .agg(sort_array(collect_list(struct(col("cmp"), col("med1"), col("med0")))).as("cm"))
    val grpMeds = perGrp.select(col("__key"), col("__grp"))
      .join(broadcast(medArr), Seq("__key"))
      .select(col("__key"), col("__grp"),
        col("cm.cmp").as("cmps"),
        transform(col("cm"), x =>
          when(x.getField("cmp") === col("__grp"), x.getField("med1"))
            .otherwise(x.getField("med0"))).as("meds"))
    val grpSums = r.join(broadcast(grpMeds), Seq("__key", "__grp"))
      .groupBy(col("__key"), col("__grp"))
      .agg(count(lit(1)).as("n_g"),
        graft.stats.AbsDevSumsAgg.sums(col("rscaled"), col("meds")).as("arr"),
        first("cmps").as("cmps"))
    // unpack the [Σz | Σz²] buffer on the k-rows-per-scope reduced frame
    // (k² tiny rows after the posexplode) and fold to per-(cmp, side) sums
    val kCol = size(col("cmps"))
    val sideStats = grpSums
      .select(col("__key"), col("__grp"), col("n_g"), col("cmps"),
        slice(col("arr"), lit(1), kCol).as("z1s"),
        slice(col("arr"), kCol + lit(1), kCol).as("z2s"))
      .select(col("__key"), col("__grp"), col("n_g"),
        posexplode(arrays_zip(col("cmps"), col("z1s"), col("z2s"))))
      .select(col("__key"), col("__grp"), col("n_g"),
        col("col.cmps").as("cmp"), col("col.z1s").as("z1"), col("col.z2s").as("z2"))
      .withColumn("side", when(col("__grp") === col("cmp"), 1).otherwise(0))
      .groupBy("__key", "cmp", "side")
      .agg(sum("n_g").as("n_s"), sum("z1").as("sz"), sum("z2").as("szz"))
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
    // per-comparison rows only (k per scope) — cached so verdicts +
    // violations share one computation (cache-manager plan dedup)
    CategoricalConsistency.holmWithinPanel(withF, Seq("__key")).trackedCache()
  }

  def verdicts(df: DataFrame, check: GroupVarianceCheck): DataFrame =
    verdictsFrom(tests(df, check), check)

  /** Verdicts from a prebuilt `tests` frame — lets the Runner build the
    * (eager, Gram-collecting) tests lineage ONCE for both outputs. */
  def verdictsFrom(t: DataFrame, check: GroupVarianceCheck): DataFrame = {
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

  def violations(df: DataFrame, check: GroupVarianceCheck): DataFrame =
    violationsFrom(tests(df, check), check)

  def violationsFrom(testsFrame: DataFrame, check: GroupVarianceCheck): DataFrame = {
    val t = testsFrame.filter(!col("p_holm").isNaN && col("p_holm") < check.alpha)
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
