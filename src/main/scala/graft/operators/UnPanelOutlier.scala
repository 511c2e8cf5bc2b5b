package graft.operators

import graft.checks.Results
import graft.stats.UnCov

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Unstructured-covariance (`type=UN`) panel outlier check — the PROC
  * MIXED `repeated <slot> / subject=<id> type=UN` surface of
  * longitudinalPlot.sas:423-442, for slot-structured panels (visit /
  * calendar-bin panels), complementing the random-intercept default
  * (LongitudinalOutlier).
  *
  * Semantics (see UnCov for the estimator statement): the panel value is
  * the per-(subject, slot) mean of the outcome; subjects observed in every
  * slot of their scope form the complete-case panel; fixed effects are the
  * slot cell means (= GLS for any Σ on balanced data); Σ̂ is the pooled
  * residual cross-product matrix; each subject's d² = rᵀ Σ̂⁻¹ r is flagged
  * against the χ²_T quantile at `cutoffPct`.
  *
  * Spark shape: cell means + slot means are two groupBy passes; the T×T
  * cross-products are one bounded self-join + groupBy (UnCov); scoring is
  * one collect_list per subject (bounded by T ≤ MaxSlots) against a
  * BROADCAST (key → Σ̂⁻¹) map — no per-row driver work, nothing
  * subject-proportional collected except the T²-per-scope entries.
  * Scopes whose Σ̂ is singular (k ≤ T or degenerate residuals) are
  * reported as not-evaluable (`pass = null` verdict); scopes whose slot
  * count exceeds `UnCov.MaxSlots` are EXCLUDED from evaluation (T² pair
  * blow-up guard) — both policies explicit, nothing fabricated.
  */
object UnPanelOutlier {

  final case class Config(
      id: String,
      outcome: String,
      idCol: String,
      slotCol: String,
      scope: Seq[String] = Nil,
      cutoffPct: Double = 99.0,
      severity: String = "warning")

  /** First-class check → (input with slot column, operator config) — the
    * Runner's entry point. A dateCol-form check derives its slot as a
    * calendar bin here (narrow projection, no shuffle); a slotCol-form
    * check passes through. */
  def prepared(df: DataFrame, c: graft.checks.UnPanelCheck): (DataFrame, Config) =
    c.dateCol match {
      case Some(d) =>
        // INT panel code, not the label: the slot is internal (dense index
        // + ordering only — code order == label order) and the label build
        // was per-row string work in the full scan
        (df.withColumn("__un_slot", PanelBins.panelCode(col(d), c.interval)),
          Config(c.id, c.outcome, c.idCol, "__un_slot", c.scope, c.cutoffPct, c.severity))
      case None =>
        (df, Config(c.id, c.outcome, c.idCol, c.slotCol, c.scope, c.cutoffPct, c.severity))
    }

  private def keyed(df: DataFrame, cfg: Config): DataFrame = {
    val keyCol =
      if (cfg.scope.isEmpty) lit("")
      else concat_ws("/", cfg.scope.map(c => coalesce(col(c).cast("string"), lit("∅"))): _*)
    df.filter(col(cfg.outcome).isNotNull && col(cfg.slotCol).isNotNull &&
        col(cfg.idCol).isNotNull)
      .withColumn("__key", keyCol)
  }

  /** Complete-case panel with dense slot index and residuals from slot
    * means: one row per (key, subj, slot) with `__si`, `__r`, `__T`. */
  private[operators] def residualPanel(df: DataFrame, cfg: Config): DataFrame = {
    // group by the NATIVE subject id; the public string form is rendered
    // on the reduced one-row-per-(subj, slot) frame, not per input row
    // cache the reduced cell frame (one row per (key, subj, slot) — tiny
    // at any input scale): it feeds FOUR plan branches (the slot domain,
    // the complete-subject filter, the slot means and the final join), and
    // uncached each branch re-ran the full-input groupBy (measured ~4 ×
    // 1.5 s of the un-panel family's 6.4 s bench leg at 2 M pages).
    import graft.engine.CacheTracker.TrackedCacheOps
    val cell = keyed(df, cfg)
      .groupBy(col("__key"), col(cfg.idCol).as("__subjN"),
        col(cfg.slotCol).as("__slot"))
      .agg(avg(col(cfg.outcome).cast("double")).as("__y"))
      .withColumn("__subj", col("__subjN").cast("string")).drop("__subjN")
      .trackedCache()
    // slot domain per key with a dense 0-based index, in ONE reduced agg:
    // distinct (key, slot) → per-key sorted slot array → posexplode. This
    // replaced a distinct + T² inequality self-join + two groupBys (round-5
    // stage-latency trim: the un-panel family's cost at bench scale was
    // mostly fixed stage latency, BENCH/BASELINE.md) and it also degrades
    // linearly on a hostile high-cardinality slot column — the self-join
    // form went quadratic in T BEFORE the MaxSlots filter could drop the
    // key, while collect_set holds ≤ T values per key and the filter runs
    // on the array size. Slot count past MaxSlots → key excluded (same
    // explicit policy as before).
    val slotIdx = cell.select("__key", "__slot").distinct()
      .groupBy("__key")
      .agg(sort_array(collect_set(col("__slot"))).as("__slots"))
      .filter(size(col("__slots")) <= UnCov.MaxSlots)
      .select(col("__key"), size(col("__slots")).cast("int").as("__T"),
        posexplode(col("__slots")))
      .select(col("__key"), col("col").as("__slot"),
        col("pos").cast("int").as("__si"), col("__T"))
    val cellIdx = cell.join(broadcast(slotIdx), Seq("__key", "__slot"))
    // complete-case subjects: observed in every slot of their scope
    val completeSubj = cellIdx.groupBy("__key", "__subj")
      .agg(count(lit(1)).as("__ns"), first("__T").as("__t"))
      .filter(col("__ns") === col("__t"))
      .select("__key", "__subj")
    val pan = cellIdx.join(completeSubj, Seq("__key", "__subj"), "left_semi")
    // slot means over the retained (complete) subjects → residuals
    val mu = pan.groupBy("__key", "__si")
      .agg(avg("__y").as("__mu"))
    pan.join(broadcast(mu), Seq("__key", "__si"))
      .withColumn("__r", col("__y") - col("__mu"))
  }

  /** One row per (key, subject): d², the χ² cutoff, and the outlier flag.
    * `d2` is null where the scope was not evaluable (singular Σ̂). */
  def scored(df: DataFrame, cfg: Config): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import graft.engine.CacheTracker.TrackedCacheOps
    // the panel lineage (filter → 2 groupBys → 4 joins over the full
    // input) is executed by BOTH the Σ̂ collect below and the scoring
    // groupBy — cached so the row-proportional frame is read once, not
    // twice (narrow: one row per (key, subj, slot), slots ≤ MaxSlots)
    val panel = residualPanel(df, cfg).trackedCache()
    // T² entries per scope — the ONLY driver-side collect, key-proportional
    val entries = UnCov.pooledCrossProducts(panel, "__key", "__subj", "__si", "__r")
      .collect()
      .groupBy(_.getString(0))
    val perKey: Map[String, (Array[Array[Double]], Int, Long)] =
      entries.flatMap { case (k, rows) =>
        val t = rows.map(_.getInt(2)).max + 1
        val kSubj = rows.map(_.getLong(4)).max
        val cov = UnCov.covMatrix(
          rows.map(r => (r.getInt(1), r.getInt(2), r.getDouble(3))).toSeq, t, kSubj)
        Option(UnCov.invert(cov)).map(inv => k -> (inv, t, kSubj))
      }
    val cutoffs = perKey.toSeq.map { case (k, (_, t, kSubj)) =>
      (k, UnCov.chi2Inv(cfg.cutoffPct, t), t, kSubj)
    }.toDF("__key", "cutoff", "t_slots", "k_subjects")
    val bc = spark.sparkContext.broadcast(perKey.map { case (k, (inv, t, _)) => k -> ((inv, t)) })
    val d2Udf = udf { (key: String, v: Seq[Row]) =>
      bc.value.get(key).map { case (inv, t) =>
        val r = new Array[Double](t)
        v.foreach(row => r(row.getInt(0)) = row.getDouble(1))
        UnCov.mahalanobis(r, inv)
      }
    }
    panel.groupBy("__key", "__subj")
      .agg(collect_list(struct(col("__si"), col("__r"))).as("__v"))
      .withColumn("d2", d2Udf(col("__key"), col("__v")))
      .join(broadcast(cutoffs), Seq("__key"), "left")
      .withColumn("flag_outlier",
        coalesce(col("d2") > col("cutoff"), lit(false)))
      .drop("__v")
  }

  def verdicts(df: DataFrame, cfg: Config): DataFrame =
    verdictsFrom(scored(df, cfg), cfg)

  /** Verdicts from a prebuilt `scored` frame — lets the Runner (and any
    * caller that needs both outputs) build the eager, Σ̂-collecting scored
    * lineage ONCE, matching the sibling operators' `verdictsFrom` shape. */
  def verdictsFrom(sc: DataFrame, cfg: Config): DataFrame = {
    val framed = sc.groupBy(col("__key")).agg(
      sum(when(col("flag_outlier"), 1L).otherwise(0L)).as("n_outliers"),
      count(lit(1)).as("n"),
      (max(when(col("d2").isNotNull, 1).otherwise(0)) === 1).as("evaluable"),
      first("cutoff").as("cut"))
      .select(
        col("__key").as("partition"),
        lit("un_panel_outliers").as("metric"),
        col("n_outliers").cast("double").as("stat"),
        col("cut").as("threshold"),
        col("n").as("n_obs"),
        when(col("evaluable"), col("n_outliers") === 0).as("pass"))
    Results.toVerdicts(framed, cfg.id, cfg.severity)
  }

  def violations(df: DataFrame, cfg: Config): DataFrame =
    violationsFrom(scored(df, cfg), cfg)

  def violationsFrom(sc: DataFrame, cfg: Config): DataFrame = {
    val v = sc.filter(col("flag_outlier")).select(
      col("__subj").as("key"),
      col("__key").as("partition"),
      concat(lit("d2="), round(col("d2"), 4).cast("string")).as("observed"),
      concat(lit("d2 < "), round(col("cutoff"), 4).cast("string")).as("expected"),
      lit("UN-covariance panel outlier").as("label"))
    Results.toViolations(v, cfg.id)
  }
}
