package graft.operators

import graft.engine.CacheTracker.TrackedCacheOps
import graft.checks.{DigitPreferenceCheck, Results}
import graft.stats.Distributions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Terminal-digit-preference check — %digitpref (DigitPref.sas) re-expressed.
  *
  * Digit extraction is the reference's exact arithmetic
  * (DigitPref.sas:141,156): digit at place d = floor(v/d − 10·floor(v/(10d)));
  * a value that does not reach place d (fewer decimals than the place
  * requires) is the sentinel −1 "None" (DigitPref.sas:142,157), excluded
  * from the goodness-of-fit test but reported as a share (M12).
  *
  * Tests per (scope, panel, group):
  *   - GOF chi-square vs uniform 10% per digit 0–9, df=9 (M8,
  *     DigitPref.sas:349-355);
  *   - share of sentinel −1 (M12, :358-363).
  * Flags (M13, DigitPref.sas:378-396): gof p < alpha, or none-share >
  * noneThreshold%.
  *
  * One shuffle: groupBy(scope, panel, group, digit).count; everything after
  * runs on ≤ 11 rows per group.
  */
object DigitPreference {

  /** Digit at decimal place `d` (1=ones, 0.1=tenths, 10=tens); −1 sentinel
    * when the value has no digit at that place (integer-recorded values at
    * a fractional place). Mirrors DigitPref.sas:133-158: decimals counted
    * on the plain string rendering with trailing zeros trimmed.
    */
  def digitAt(v: Column, d: Double): Column = {
    // epsilon guards the float truncation 0.57/0.01 → 56.999… (the SAS
    // original has the same hazard; we fix it — deviation documented)
    val eps = lit(1e-6)
    val raw = floor(v / d + eps - lit(10.0) * floor(v / (10.0 * d) + eps))
    // decimal places of v as rendered (trailing zeros trimmed):
    // cast to string; fractional part length after removing trailing zeros
    val s = format_number(abs(v), 10) // fixed 10 decimals, grouping commas
    val frac = regexp_replace(regexp_extract(s, "\\.(\\d*?)0*$", 1), ",", "")
    val numdec = length(frac)
    val placeDecimals = math.max(0, -math.floor(math.log10(d)).toInt)
    if (placeDecimals == 0) raw.cast("int")
    // the sentinel test (DecimalFormat render + two regexes per row) can
    // only fire when the raw digit is 0, so CaseWhen's lazy branch
    // evaluation keeps the string machinery off the ~90% of rows with a
    // non-zero digit — same values, ~10× less per-row formatting in the
    // fused cell scan (JFR: DecimalFormat/regex were top-20 suite frames)
    else when(raw =!= 0, raw.cast("int")).otherwise(
      when(numdec < placeDecimals, lit(-1)).otherwise(lit(0))).cast("int")
  }

  // row-level panel key is the INT code; the label is rendered on the
  // reduced counts frame (PanelBins.panelCode scaladoc has the rationale)
  private def panelCodeExpr(check: DigitPreferenceCheck) = check.dateCol match {
    case Some(dc) => PanelBins.panelCode(col(dc), check.interval)
    case None => lit(-1)
  }

  /** This check's slice of the fused multi-family cell scan (CellScan):
    * same filter + key derivations as the standalone counts pass below.
    * Panel and group ride the scan in their NATIVE types (int code / raw
    * column) — the per-row cast-to-string was ~2% of suite CPU. */
  def cellFamily(check: DigitPreferenceCheck): CellScan.Family =
    CellScan.Family(
      col(check.column).isNotNull && col(check.groupCol).isNotNull,
      check.scope.map(s => s -> col(s)) ++ Seq(
        "panel" -> panelCodeExpr(check),
        "grp" -> col(check.groupCol),
        "digit" -> digitAt(col(check.column).cast("double"), check.place)))

  /** Reduced-frame rendering of the scan-native keys back to the public
    * (panel label, string group) shape every downstream stage consumes. */
  private def rendered(counts: DataFrame, check: DigitPreferenceCheck): DataFrame =
    PanelBins.renderPanelCol(counts, check.interval)
      .withColumn("grp", col("grp").cast("string"))

  /** (scope, panel, grp, digit) counts with group totals — zero-filled over
    * the fixed digit domain −1..9 (DigitPref.sas:253-257).
    * @param pre pre-aggregated (scope..., panel, grp, digit, cnt) counts
    *            from the fused CellScan — skips this check's own input scan.
    */
  def digitCounts(df: DataFrame, check: DigitPreferenceCheck,
      pre: Option[DataFrame] = None): DataFrame = {
    val keyCols = check.scope :+ "panel" :+ "grp"
    // cached: ≤ 11 rows per (scope, panel, group); reused by the domain
    // shell, the tests and the violations lineages (one row-level pass)
    val counts = rendered(pre.getOrElse {
      df.filter(col(check.column).isNotNull && col(check.groupCol).isNotNull)
        .withColumn("panel", panelCodeExpr(check))
        .withColumn("grp", col(check.groupCol))
        .withColumn("digit", digitAt(col(check.column).cast("double"), check.place))
        .groupBy((keyCols :+ "digit").map(col): _*)
        .agg(count(lit(1)).as("cnt"))
        .trackedCache()
    }, check)
    // fixed digit domain: explode literal array — no extra scan. Null-safe
    // fill join: null scope/panel groups keep their own counts
    val dom = counts.select(keyCols.map(col): _*).distinct()
      .withColumn("digit", explode(lit((-1 to 9).toArray)))
    NullSafeJoin.left(dom, counts, keyCols :+ "digit")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
  }

  /** Per-(scope, panel, grp) test frame: GOF chi-square (digits 0-9 vs
    * uniform), none-share %, flags. */
  def tests(df: DataFrame, check: DigitPreferenceCheck,
      pre: Option[DataFrame] = None): DataFrame = {
    val keyCols = check.scope :+ "panel" :+ "grp"
    val dc = digitCounts(df, check, pre)
    val perGrp = dc.groupBy(keyCols.map(col): _*).agg(
      sum(when(col("digit") >= 0, col("cnt")).otherwise(0L)).as("n_gof"),
      sum(col("cnt")).as("n_total"),
      sum(when(col("digit") === -1, col("cnt")).otherwise(0L)).as("n_none"),
      sum(when(col("digit") >= 0,
        pow(col("cnt").cast("double"), 2)).otherwise(0.0)).as("sum_sq"))
    // X² vs uniform: e = n/10 per digit; Σ(o−e)²/e = (Σo²)·10/n − n
    val withStat = perGrp
      .filter(col("n_total") > check.minNum)
      .withColumn("gof_stat",
        when(col("n_gof") > 0, col("sum_sq") * 10.0 / col("n_gof") - col("n_gof")).otherwise(lit(null)))
      .withColumn("none_pct", col("n_none") * 100.0 / col("n_total"))
    val pUdf = udf((stat: java.lang.Double) =>
      if (stat == null) Double.NaN else Distributions.chiSqPValue(stat, 9.0))
    withStat
      .withColumn("gof_p", pUdf(col("gof_stat")))
      .withColumn("flag_gof", col("gof_p") < check.alpha)
      .withColumn("flag_none", col("none_pct") > check.noneThreshold)
      .withColumn("pass", !(col("flag_gof") || col("flag_none")))
  }

  def verdicts(df: DataFrame, check: DigitPreferenceCheck,
      pre: Option[DataFrame] = None): DataFrame =
    verdictsFrom(tests(df, check, pre), check)

  /** Verdicts from a prebuilt `tests` frame — lets the Runner build the
    * tests lineage ONCE for both outputs. */
  def verdictsFrom(t: DataFrame, check: DigitPreferenceCheck): DataFrame = {
    val framed = t.select(
      partitionOf(check), lit("digit_gof_chisq").as("metric"),
      col("gof_stat").as("stat"), col("gof_p").as("p_value"),
      lit(check.alpha).as("threshold"), col("n_gof").cast("long").as("n_obs"),
      col("pass"))
    val noneFramed = t.select(
      partitionOf(check), lit("digit_none_pct").as("metric"),
      col("none_pct").as("stat"), lit(null).cast("double").as("p_value"),
      lit(check.noneThreshold).as("threshold"), col("n_total").cast("long").as("n_obs"),
      (!col("flag_none")).as("pass"))
    Results.toVerdicts(framed, check.id, check.severity)
      .unionByName(Results.toVerdicts(noneFramed, check.id, check.severity))
  }

  private def partitionOf(check: DigitPreferenceCheck): Column =
    concat_ws("/",
      (check.scope.map(s => concat_ws("=", lit(s), col(s).cast("string"))) ++
        Seq(concat(lit("panel="), col("panel")),
          concat(lit("grp="), col("grp")))): _*).as("partition")

  /** Violations: failing groups with their most-preferred digit. */
  def violations(df: DataFrame, check: DigitPreferenceCheck,
      pre: Option[DataFrame] = None): DataFrame =
    violationsFrom(tests(df, check, pre), df, check, pre)

  def violationsFrom(t: DataFrame, df: DataFrame, check: DigitPreferenceCheck,
      pre: Option[DataFrame] = None): DataFrame = {
    val keyCols = check.scope :+ "panel" :+ "grp"
    val failing = t.filter(!col("pass"))
      .select((keyCols.map(col) :+ col("gof_p") :+ col("none_pct")): _*)
    val dc = digitCounts(df, check, pre).filter(col("digit") >= 0)
    val joined = NullSafeJoin(dc, failing, keyCols)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col("cnt").desc, col("digit"))
    val v = joined.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(
        col("grp").as("key"),
        concat_ws("/",
          (check.scope.map(s => concat_ws("=", lit(s), col(s).cast("string"))) :+
            concat(lit("panel="), col("panel"))): _*).as("partition"),
        concat(lit("digit "), col("digit").cast("string"), lit(" × "),
          col("cnt").cast("string")).as("observed"),
        lit("uniform 10% per digit").as("expected"),
        concat(lit("terminal-digit preference, gof_p="),
          round(col("gof_p"), 6).cast("string"),
          lit(", none%="), round(col("none_pct"), 2).cast("string")).as("label"))
    Results.toViolations(v, check.id)
  }
}
