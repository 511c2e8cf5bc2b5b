package graft.operators

import graft.engine.CacheTracker.TrackedCacheOps
import graft.checks.{CategoricalConsistencyCheck, Results}
import graft.stats.{Distributions, Holm}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Categorical-consistency / drift check — %catchk re-expressed.
  *
  * Reference (Categorical_Check.sas) runs one PROC FREQ **per (panel, bar)**
  * one-vs-rest table (:289-307) and one per pairwise (i,j) (:368-419) —
  * O(k²) full re-scans. Here the whole check is ONE lineage with a single
  * row-level shuffle:
  *
  *   scan → panel bin (F2) → groupBy(panel, group, value).count   [shuffle 1]
  *   → window totals over the counts frame (W2, no extra shuffle of raw rows)
  *   → zero-fill shell via the panel-value domain (J6)
  *   → one-vs-rest cells (A9) → chi-square columns (M7)
  *   → Holm per panel (M10, group-level rows only)
  *   → verdicts (M13) + violation rows (worst-deviating category).
  *
  * Everything after the groupBy operates on (panels × groups × categories)
  * rows — thousands, not 10^12 — so window functions and the Holm
  * collect_list are cheap regardless of input scale.
  */
object CategoricalConsistency {

  // row-level panel key is the INT code; the label is rendered on the
  // reduced counts frame (PanelBins.panelCode scaladoc has the rationale)
  private def panelCodeExpr(check: CategoricalConsistencyCheck) = check.dateCol match {
    case Some(dc) => PanelBins.panelCode(col(dc), check.interval)
    case None => lit(-1)
  }

  /** This check's slice of the fused multi-family cell scan (CellScan):
    * same filter + key derivations as the standalone counts pass below. */
  def cellFamily(check: CategoricalConsistencyCheck): CellScan.Family =
    CellScan.Family(
      col(check.valueCol).isNotNull && col(check.groupCol).isNotNull,
      check.scope.map(s => s -> col(s)) ++ Seq(
        "panel" -> panelCodeExpr(check),
        "grp" -> col(check.groupCol),
        "value" -> col(check.valueCol)))

  /** Contingency cells with one-vs-rest margins, zero-filled.
    * Output grain: (scopeCols..., panel, grp, value) with cnt, grp_total,
    * panel_value_total, panel_total.
    * @param pre pre-aggregated (scope..., panel, grp, value, cnt) counts
    *            from the fused CellScan — skips this check's own input scan.
    */
  def cells(df: DataFrame, check: CategoricalConsistencyCheck,
      pre: Option[DataFrame] = None): DataFrame = {
    val keyCols = check.scope :+ "panel"
    // cache the reduced counts frame (panels × groups × categories rows —
    // tiny at any input scale): the shell domains, fill join, tests and
    // violations all reuse it, so the 10^12-row aggregation runs ONCE.
    // Spark's cache manager dedups identical plans, so verdicts+violations
    // share this cache across separate calls.
    val counts = pre.getOrElse {
      df.filter(col(check.valueCol).isNotNull && col(check.groupCol).isNotNull)
        .withColumn("panel", panelCodeExpr(check))
        .select((keyCols :+ check.groupCol :+ check.valueCol).map(col): _*)
        .groupBy((keyCols :+ check.groupCol :+ check.valueCol).map(col): _*)
        .agg(count(lit(1)).as("cnt"))
        .withColumnRenamed(check.groupCol, "grp")
        .withColumnRenamed(check.valueCol, "value")
        .trackedCache()
    }
    // panel label rendering happens HERE, on the reduced frame — the scan
    // grouped on the int panel code (no-op for caller-built string pres)
    val countsR = PanelBins.renderPanelCol(counts, check.interval)
    // zero-fill shell: (panel × grp) ⨯ (panel × value) domains (J6).
    // Null-safe joins: null scope values and null panels (null dateCol)
    // form real groups that must keep their counts, not be dropped/zeroed
    val grpDom = countsR.select((keyCols :+ "grp").map(col): _*).distinct()
    val valDom = countsR.select((keyCols :+ "value").map(col): _*).distinct()
    val shell = NullSafeJoin(grpDom, valDom, keyCols)
    val filled = NullSafeJoin.left(shell, countsR, keyCols :+ "grp" :+ "value")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val wGrp = Window.partitionBy((keyCols :+ "grp").map(col): _*)
    val wVal = Window.partitionBy((keyCols :+ "value").map(col): _*)
    val wPanel = Window.partitionBy(keyCols.map(col): _*)
    filled
      .withColumn("grp_total", sum("cnt").over(wGrp))
      .withColumn("panel_value_total", sum("cnt").over(wVal))
      .withColumn("panel_total", sum("cnt").over(wPanel))
  }

  /** Per-(panel, grp) one-vs-rest test results: chi-square / Freeman–Halton
    * Fisher on the full table, raw p, Holm-adjusted p within panel.
    */
  def tests(df: DataFrame, check: CategoricalConsistencyCheck,
      pre: Option[DataFrame] = None): DataFrame =
    holmWithinPanel(oneVsRestRaw(df, check, pre), check.scope :+ "panel")

  /** One-vs-rest frame with raw p-values, BEFORE the Holm adjustment —
    * the multtest input rows the reference tags plot='Stacked'
    * (Categorical_Check.sas:435-441). */
  private[operators] def oneVsRestRaw(df: DataFrame, check: CategoricalConsistencyCheck,
      pre: Option[DataFrame] = None): DataFrame = {
    val keyCols = check.scope :+ "panel"
    val c = cells(df, check, pre)
    // one-vs-rest 2×C cells: o1 = cnt, o2 = panel_value_total - cnt
    // expected under homogeneity: e1 = grp_total * pvt / N, e2 = (N-grp_total) * pvt / N
    val withE = c
      .withColumn("o1", col("cnt").cast("double"))
      .withColumn("o2", (col("panel_value_total") - col("cnt")).cast("double"))
      .withColumn("e1", col("grp_total") * col("panel_value_total") / col("panel_total"))
      .withColumn("e2", (col("panel_total") - col("grp_total")) * col("panel_value_total") / col("panel_total"))
      .withColumn("x2_term",
        when(col("e1") > 0, pow(col("o1") - col("e1"), 2) / col("e1")).otherwise(0.0) +
        when(col("e2") > 0, pow(col("o2") - col("e2"), 2) / col("e2")).otherwise(0.0))
    val perGrp = withE
      .groupBy((keyCols :+ "grp").map(col): _*)
      .agg(
        sum("x2_term").as("stat"),
        (countDistinct("value") - 1).cast("double").as("df"),
        first("grp_total").as("n_grp"),
        first("panel_total").as("n_panel"),
        // 2×2 cells for Fisher when the panel has exactly 2 categories:
        // sort by value for determinism
        sort_array(collect_list(struct(col("value"), col("o1"), col("o2")))).as("cells2"))
      .filter(col("n_grp") > check.minNum && col("df") >= 1 &&
        col("n_panel") > col("n_grp")) // a single-group panel has no "rest"
    val useFisher = check.test.equalsIgnoreCase("fisher")
    // which test actually produced the p-value: fisher runs the
    // Freeman–Halton network algorithm on the full 2×C table (matching
    // PROC FREQ's exact test on var×inBar, Categorical_Check.sas:298,305);
    // only when the table exceeds the exact-enumeration budget do we fall
    // back to chi-square, FLAGGED so the verdict row is honest about the
    // substitution (SURVEY §7.6.2).
    val pUdf = udf((stat: Double, dfree: Double,
        cells2: Seq[org.apache.spark.sql.Row]) => {
      if (useFisher) {
        val row1 = cells2.map(_.getDouble(1).round).toArray
        val row2 = cells2.map(_.getDouble(2).round).toArray
        Distributions.fisherExact2xC(row1, row2) match {
          case Some(p) => (p, "fisher")
          case None => (Distributions.chiSqPValue(stat, dfree), "chisq_fallback")
        }
      } else (Distributions.chiSqPValue(stat, dfree), "chisq")
    })
    perGrp
      .withColumn("pt", pUdf(col("stat"), col("df"), col("cells2")))
      .withColumn("p_raw", col("pt._1"))
      .withColumn("test_used", col("pt._2"))
      .drop("cells2", "pt")
  }

  /** Pairwise (i<j) group-vs-group tests — the reference's heat-map grid
    * (Categorical_Check.sas:368-419): one chi-square/Fisher per group pair
    * per panel over the values × {gᵢ, gⱼ} table, untestable/missing pairs
    * fall back to p=1 (:402-416), Holm within panel across all pairs.
    *
    * The reference runs O(k²) PROC FREQ re-scans; here the whole grid is a
    * self-join of the cached counts frame (panels × C(k,2) × categories
    * rows — thousands at any input scale) plus one shell join for the
    * missing pairs, so input rows are scanned ONCE regardless of k.
    *
    * Deviations documented: (a) df counts categories with a nonzero pair
    * row total (SAS /zeros keeps all-zero rows in the printed table; they
    * contribute no information); (b) by default Holm is applied over the
    * pairwise family per panel so each surface is independently
    * consumable — `holmPooled=true` reproduces the reference's exact
    * pooled multtest family instead (`pooledTests`, :435-466).
    */
  def pairwiseTests(df: DataFrame, check: CategoricalConsistencyCheck,
      pre: Option[DataFrame] = None): DataFrame =
    holmWithinPanel(pairwiseRaw(df, check, pre), check.scope :+ "panel")

  /** Pairwise frame with raw p-values, BEFORE the Holm adjustment — the
    * multtest input rows the reference tags plot='Heat'
    * (Categorical_Check.sas:435-448). */
  private[operators] def pairwiseRaw(df: DataFrame, check: CategoricalConsistencyCheck,
      pre: Option[DataFrame] = None): DataFrame = {
    val keyCols = check.scope :+ "panel"
    val c = cells(df, check, pre)
      .filter(col("grp_total") > check.minNum)
      .select((keyCols.map(col) :+ col("grp") :+ col("value") :+
        col("cnt") :+ col("grp_total")): _*)
    val a = c.select((keyCols.map(col) :+ col("grp").as("grp1") :+ col("value") :+
      col("cnt").as("c1") :+ col("grp_total").as("n1")): _*)
    val b = c.select((keyCols.map(col) :+ col("grp").as("grp2") :+ col("value") :+
      col("cnt").as("c2") :+ col("grp_total").as("n2")): _*)
    val withE = NullSafeJoin(a, b, keyCols :+ "value")
      .filter(col("grp1") < col("grp2"))
      .withColumn("rv", (col("c1") + col("c2")).cast("double"))
      .withColumn("n", (col("n1") + col("n2")).cast("double"))
      .withColumn("e1", col("n1") * col("rv") / col("n"))
      .withColumn("e2", col("n2") * col("rv") / col("n"))
      .withColumn("x2_term",
        when(col("e1") > 0, pow(col("c1") - col("e1"), 2) / col("e1")).otherwise(0.0) +
        when(col("e2") > 0, pow(col("c2") - col("e2"), 2) / col("e2")).otherwise(0.0))
    val perPair = withE
      .groupBy((keyCols :+ "grp1" :+ "grp2").map(col): _*)
      .agg(
        sum("x2_term").as("stat"),
        (countDistinct(when(col("rv") > 0, col("value"))) - 1).cast("double").as("df"),
        first("n1").as("n1"),
        first("n2").as("n2"),
        sort_array(collect_list(when(col("rv") > 0,
          struct(col("value"), col("c1").cast("double"), col("c2").cast("double"))))).as("cells2"))
    // missing-pair shell: the reference emits p=1 rows for pairs PROC FREQ
    // could not test (:402-416) — here any (panel, pair) where one group is
    // absent (or the table is degenerate, df < 1)
    val grpDomGlobal = c.select(col("grp")).distinct()
    val pairDom = grpDomGlobal.select(col("grp").as("grp1"))
      .crossJoin(grpDomGlobal.select(col("grp").as("grp2")))
      .filter(col("grp1") < col("grp2"))
    val panelDom = c.select(keyCols.map(col): _*).distinct()
    val shell = panelDom.crossJoin(pairDom)
    val full = NullSafeJoin.left(shell, perPair, keyCols :+ "grp1" :+ "grp2")
      .withColumn("n1", coalesce(col("n1"), lit(0L)))
      .withColumn("n2", coalesce(col("n2"), lit(0L)))
    val useFisher = check.test.equalsIgnoreCase("fisher")
    val pUdf = udf((dfree: java.lang.Double, stat: java.lang.Double,
        cells2: Seq[org.apache.spark.sql.Row]) => {
      if (dfree == null || dfree < 1) (1.0, "missing_pair") // missing/untestable pair
      else if (useFisher) {
        // rows = the two groups, columns = values — transpose of PROC
        // FREQ's var×inBar table, same exact test by symmetry
        val row1 = cells2.map(_.getDouble(1).round).toArray
        val row2 = cells2.map(_.getDouble(2).round).toArray
        Distributions.fisherExact2xC(row1, row2) match {
          case Some(p) => (p, "fisher")
          case None => (Distributions.chiSqPValue(stat, dfree), "chisq_fallback")
        }
      } else (Distributions.chiSqPValue(stat, dfree), "chisq")
    })
    // fallback p=1 rows stay in the Holm family (the reference's multtest
    // input includes them, :435-448)
    full
      .withColumn("pt", pUdf(col("df"), col("stat"), col("cells2")))
      .withColumn("p_raw", col("pt._1"))
      .withColumn("test_used", col("pt._2"))
      .drop("cells2", "pt")
  }

  /** The reference's EXACT multtest family: one-vs-rest ('Stacked') and
    * pairwise ('Heat') p-values POOLED into one Holm step-down per panel
    * (Categorical_Check.sas:435-466), then split back. Returns
    * (oneVsRest, pairwise) frames with the pooled `p_holm`.
    *
    * Both input frames are products of the same cached cells frame, so
    * pooling adds no input scan — just one more reduced-frame union. */
  def pooledTests(df: DataFrame, check: CategoricalConsistencyCheck,
      pre: Option[DataFrame] = None): (DataFrame, DataFrame) = {
    val keyCols = check.scope :+ "panel"
    val kc = keyCols.map(col)
    val stacked = oneVsRestRaw(df, check, pre)
    val heat = pairwiseRaw(df, check, pre)
    val sNorm = stacked.select(kc :+ lit("stacked").as("family") :+
      col("grp").cast("string").as("id1") :+ lit(null).cast("string").as("id2") :+
      col("p_raw"): _*)
    val hNorm = heat.select(kc :+ lit("heat").as("family") :+
      col("grp1").cast("string").as("id1") :+ col("grp2").cast("string").as("id2") :+
      col("p_raw"): _*)
    val adjusted = holmWithinPanel(sNorm.unionByName(hNorm), keyCols).drop("p_raw")
    val adjS = adjusted.filter(col("family") === "stacked")
      .select(kc :+ col("id1").as("grp") :+ col("p_holm"): _*)
    val adjH = adjusted.filter(col("family") === "heat")
      .select(kc :+ col("id1").as("grp1") :+ col("id2").as("grp2") :+ col("p_holm"): _*)
    (NullSafeJoin(stacked.withColumn("grp", col("grp").cast("string")),
        adjS, keyCols :+ "grp"),
      NullSafeJoin(heat.withColumn("grp1", col("grp1").cast("string"))
        .withColumn("grp2", col("grp2").cast("string")),
        adjH, keyCols :+ "grp1" :+ "grp2"))
  }

  /** The reference's `_All_` overall bar (Categorical_Check.sas:317-340):
    * per panel, the all-groups-combined distribution of `valueCol` with
    * row percents. Rides the cached counts frame — no extra input scan. */
  def overallBar(df: DataFrame, check: CategoricalConsistencyCheck,
      pre: Option[DataFrame] = None): DataFrame = {
    val keyCols = check.scope :+ "panel"
    cells(df, check, pre)
      .select((keyCols.map(col) :+ col("value") :+
        col("panel_value_total") :+ col("panel_total")): _*)
      .distinct() // cells grain is (…, grp, value); totals repeat per grp
      .select((keyCols.map(col) :+
        lit("_All_").as("grp") :+
        col("value") :+
        col("panel_value_total").as("cnt") :+
        (col("panel_value_total") * 100.0 / col("panel_total")).as("row_pct") :+
        col("panel_total")): _*)
  }

  /** Holm step-down within each panel (M10). Group count per panel is tiny,
    * so collect_list per panel is safe at any input scale. */
  private[operators] def holmWithinPanel(withP: DataFrame, keyCols: Seq[String]): DataFrame = {
    val holmUdf = udf((ps: Seq[Double]) => Holm.adjust(ps.map(p => if (p == null) Double.NaN else p)))
    val spark = withP.sparkSession
    val rest = withP.columns.filterNot(keyCols.contains).toSeq
    withP
      .groupBy(keyCols.map(col): _*)
      .agg(collect_list(struct(rest.map(col): _*)).as("rows"))
      .withColumn("adj", holmUdf(expr("transform(rows, r -> r.p_raw)")))
      .select((keyCols.map(col) :+
        expr("explode(arrays_zip(rows, adj)) as z")): _*)
      .select((keyCols.map(col) :+ col("z.rows.*") :+ col("z.adj").as("p_holm")): _*)
  }

  /** Both adjusted surfaces (one-vs-rest + optional pairwise grid),
    * computed ONCE — the Runner derives verdicts AND violations from
    * these, so the Fisher enumeration / Holm UDFs over the reduced frames
    * run once per suite run instead of once per output.
    * holmPooled reproduces the reference's exact multtest family (one-vs-
    * rest + pairwise pooled per panel, :435-466); otherwise each surface
    * is adjusted within its own family. */
  def surfaces(df: DataFrame, check: CategoricalConsistencyCheck,
      pre: Option[DataFrame] = None): (DataFrame, Option[DataFrame]) = {
    val pooled = if (check.pairwise && check.holmPooled) Some(pooledTests(df, check, pre)) else None
    val t = pooled.map(_._1).getOrElse(tests(df, check, pre))
    val pair =
      if (!check.pairwise) None
      else Some(pooled.map(_._2).getOrElse(pairwiseTests(df, check, pre)))
    (t, pair)
  }

  def verdicts(df: DataFrame, check: CategoricalConsistencyCheck,
      pre: Option[DataFrame] = None): DataFrame = {
    val (t, pair) = surfaces(df, check, pre)
    verdictsFrom(t, pair, df, check, pre)
  }

  /** Verdicts from prebuilt surfaces (see `surfaces`). */
  def verdictsFrom(t: DataFrame, pairT: Option[DataFrame], df: DataFrame,
      check: CategoricalConsistencyCheck,
      pre: Option[DataFrame] = None): DataFrame = {
    val framed = t.select(
      concat_ws("/",
        (check.scope.map(s => concat_ws("=", lit(s), col(s).cast("string"))) ++
          Seq(concat(lit("panel="), col("panel")),
            concat(lit("grp="), col("grp").cast("string")))): _*).as("partition"),
      concat(col("test_used"), lit("_one_vs_rest")).as("metric"),
      col("stat"),
      col("p_holm").as("p_value"),
      lit(check.alphaBar).as("threshold"),
      col("n_grp").cast("long").as("n_obs"),
      (col("p_holm") >= check.alphaBar).as("pass"))
    // the reference's `_All_` overall bar (:317-340): one informational
    // verdict row per panel carrying the all-groups-combined n. MUST ride
    // the fused cell counts (`pre`) like every other surface: without it
    // this line re-scans the full input once per categorical check
    val overall = overallBar(df, check, pre)
      .groupBy((check.scope :+ "panel").map(col): _*)
      .agg(first("panel_total").as("n_panel"))
      .select(
        concat_ws("/",
          (check.scope.map(s => concat_ws("=", lit(s), col(s).cast("string"))) ++
            Seq(concat(lit("panel="), col("panel")), lit("grp=_All_"))): _*).as("partition"),
        lit("overall_bar").as("metric"),
        lit(null).cast("double").as("stat"),
        lit(null).cast("double").as("p_value"),
        lit(check.alphaBar).as("threshold"),
        col("n_panel").cast("long").as("n_obs"),
        lit(true).as("pass"))
    val pair = pairT.map { pt =>
      pt.select(
        concat_ws("/",
          (check.scope.map(s => concat_ws("=", lit(s), col(s).cast("string"))) ++
            Seq(concat(lit("panel="), col("panel")),
              concat(lit("pair="), col("grp1").cast("string"),
                lit("|"), col("grp2").cast("string")))): _*).as("partition"),
        concat(col("test_used"), lit("_pairwise")).as("metric"),
        col("stat"),
        col("p_holm").as("p_value"),
        lit(check.alphaBar).as("threshold"),
        (col("n1") + col("n2")).cast("long").as("n_obs"),
        (col("p_holm") >= check.alphaBar).as("pass"))
    }
    val all = (Seq(framed, overall) ++ pair.toSeq).reduce(_ unionByName _)
    Results.toVerdicts(all, check.id, check.severity)
  }

  /** Violation rows: for every failing (panel, grp), its worst-deviating
    * category with observed vs expected row-percent. */
  def violations(df: DataFrame, check: CategoricalConsistencyCheck,
      pre: Option[DataFrame] = None): DataFrame =
    violationsFrom(surfaces(df, check, pre)._1, df, check, pre)

  def violationsFrom(base: DataFrame, df: DataFrame,
      check: CategoricalConsistencyCheck,
      pre: Option[DataFrame] = None): DataFrame = {
    val keyCols = check.scope :+ "panel"
    val t = base.filter(col("p_holm") < check.alphaBar)
      .select((keyCols :+ "grp").map(col) :+ col("p_holm"): _*)
    val c = cells(df, check, pre)
      .withColumn("dev",
        when(col("grp_total") > 0 && col("panel_value_total") > 0,
          abs(col("cnt") / col("grp_total") -
            col("panel_value_total") / col("panel_total")))
          .otherwise(0.0))
    val joined = NullSafeJoin(c, t, keyCols :+ "grp")
    val w = Window.partitionBy((keyCols :+ "grp").map(col): _*).orderBy(col("dev").desc, col("value"))
    val worst = joined.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val v = worst.select(
      col("grp").cast("string").as("key"),
      concat_ws("/",
        (check.scope.map(s => concat_ws("=", lit(s), col(s).cast("string"))) :+
          concat(lit("panel="), col("panel"))): _*).as("partition"),
      concat(col("value"), lit(" @ "),
        round(col("cnt") * 100.0 / col("grp_total"), 2).cast("string"), lit("%")).as("observed"),
      concat(col("value"), lit(" @ "),
        round(col("panel_value_total") * 100.0 / col("panel_total"), 2).cast("string"), lit("%")).as("expected"),
      concat(lit("inconsistent "), lit(check.valueCol), lit(" distribution, p_holm="),
        round(col("p_holm"), 6).cast("string")).as("label"))
    Results.toViolations(v, check.id)
  }
}
