package graft.operators

import graft.stats.Ols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-pass distributed OLS (SURVEY.md M1-M3 realization).
  *
  * Pass 1 is a single codegen'd aggregation of the Gram matrix per scope
  * group — `sum(xᵢ·xⱼ)` columns, partial-aggregated map-side, so the shuffle
  * carries one ~p² row per group. The tiny normal equations are solved on
  * the driver (the reference's PROC GLM does the same work inside one SAS
  * process; our driver step is O(groups·p³) on KB of data). Pass 2 maps the
  * fits back over the rows without any shuffle.
  *
  * class-variable one-hot levels are collected up front (guarded by a
  * cardinality cap) — the reference introspects levels the same way
  * (univariatePlot.sas:793-799 distinct-into-macro-var).
  */
object OlsPass {

  final case class Design(
      contVars: Seq[String],
      discLevels: Seq[(String, Seq[String])], // var -> kept levels (all but last)
      p: Int)

  val MaxLevels = 1000

  /** Driver guard: max scope groups any pass-1-style collect may return. */
  val MaxGroups = 100000

  /** Probe class-variable levels (driver-side, tiny). Drops the last level
    * per variable — the GLM reference cell, like SAS's g2 parameterization. */
  def design(df: DataFrame, contVars: Seq[String], discVars: Seq[String]): Design = {
    val discLevels = discVars.map { v =>
      val lv = df.select(col(v).cast("string")).filter(col(v).isNotNull)
        .distinct().limit(MaxLevels + 1).collect().map(_.getString(0)).sorted.toSeq
      require(lv.size <= MaxLevels, s"class variable $v exceeds $MaxLevels levels")
      v -> lv.dropRight(1)
    }
    Design(contVars, discLevels, 1 + contVars.size + discLevels.map(_._2.size).sum)
  }

  /** Feature expressions: intercept, continuous, one-hot dummies. */
  def featureCols(d: Design): Seq[Column] =
    lit(1.0) +:
      d.contVars.map(c => col(c).cast("double")) ++:
      d.discLevels.flatMap { case (v, levels) =>
        levels.map(l => when(col(v).cast("string") === l, 1.0).otherwise(0.0))
      }

  /** Raw per-scope sufficient statistics retained alongside the fit —
    * the FGLS refit reuses them (β_gls solves an adjusted version of the
    * same normal equations; the SSE at β_gls is a closed form in them). */
  final case class RawStats(n: Long, sy: Double, syy: Double,
      sxy: Array[Double], sxx: Array[Double])

  /** Pass 1 + driver solve: per-scope-group OLS fits.
    * @return map from scope-key string to fit. */
  def fitPerGroup(df: DataFrame, outcome: String, d: Design,
      scope: Seq[String]): Map[String, Ols.Fit] =
    fitPerGroupRaw(df, outcome, d, scope).map { case (k, (_, f)) => k -> f }

  /** Like `fitPerGroup` but also returns the raw sufficient statistics. */
  def fitPerGroupRaw(df: DataFrame, outcome: String, d: Design,
      scope: Seq[String]): Map[String, (RawStats, Ols.Fit)] = {
    val y = col(outcome).cast("double")
    val xs = featureCols(d)
    val p = d.p
    val sums = Seq(count(lit(1)).as("n"), sum(y).as("sy"), sum(y * y).as("syy")) ++
      xs.zipWithIndex.map { case (x, i) => sum(x * y).as(s"sxy_$i") } ++
      (for (i <- 0 until p; j <- i until p)
        yield sum(xs(i) * xs(j)).as(s"sxx_${i}_$j"))
    val filtered = completeCasesSimple(df, outcome, d)
    val grouped =
      if (scope.isEmpty) filtered.groupBy()
      else filtered.groupBy(scope.map(c => col(c).cast("string")): _*)
    // the collected frame is one ~p²-double row per scope group — guard the
    // driver against an unbounded scope (same role as the reference's
    // by-value cardinality assumptions)
    val stats = grouped.agg(sums.head, sums.tail: _*).limit(MaxGroups + 1).collect()
    require(stats.length <= MaxGroups,
      s"OLS scope ${scope.mkString(",")} exceeds $MaxGroups groups — " +
        "coarsen the scope or shard the fit")
    stats.map { row =>
      val key = scope.indices.map(i => Option(row.get(i)).map(_.toString).getOrElse("∅")).mkString("/")
      val off = scope.size
      val n = row.getLong(off + 0)
      val sy = row.getDouble(off + 1)
      val syy = row.getDouble(off + 2)
      val sxy = Array.tabulate(p)(i => row.getDouble(off + 3 + i))
      val sxx = new Array[Double](p * p)
      var idx = off + 3 + p
      for (i <- 0 until p; j <- i until p) {
        val v = row.getDouble(idx); idx += 1
        sxx(i * p + j) = v; sxx(j * p + i) = v
      }
      key -> (RawStats(n, sy, syy, sxy, sxx), Ols.solve(n, sy, syy, sxy, sxx))
    }.toMap
  }

  /** Non-missing filter across analysis variables. */
  def completeCasesSimple(df: DataFrame, outcome: String, d: Design): DataFrame = {
    val needed = outcome +: (d.contVars ++ d.discLevels.map(_._1))
    needed.foldLeft(df)((acc, c) => acc.filter(col(c).isNotNull))
  }

  /** Widest design the unrolled column-arithmetic pass handles; wider
    * designs (p² expression terms) fall back to the UDF path. */
  val MaxUnrollP = 16

  /** Pass 2: per-row residual statistics (resid, leverage, rstudent, cookd,
    * dfe, s2). No shuffle. The hot path is pure column arithmetic over a
    * broadcast-joined fit row (β, (XᵀX)⁺ unrolled to p + p² literal-ish
    * columns) so the widest row-level pass of the statistical operators
    * stays inside whole-stage codegen — no per-row Scala UDF or array
    * allocation (round-1 fix). */
  def rowStats(df: DataFrame, outcome: String, d: Design,
      scope: Seq[String], fits: Map[String, Ols.Fit]): DataFrame = {
    val filtered = withKey(df, outcome, d, scope)
    if (d.p <= MaxUnrollP) rowStatsUnrolled(filtered, outcome, d, fits)
    else rowStatsUdf(filtered, outcome, d, fits)
  }

  /** Complete-cases frame with the `__key` scope column — the common
    * input of the row pass and the FGLS subject-sums pass. */
  def withKey(df: DataFrame, outcome: String, d: Design, scope: Seq[String]): DataFrame = {
    val keyCol =
      if (scope.isEmpty) lit("")
      else concat_ws("/", scope.map(c => coalesce(col(c).cast("string"), lit("∅"))): _*)
    completeCasesSimple(df, outcome, d).withColumn("__key", keyCol)
  }

  /** Codegen path: same arithmetic (and operation order) as Ols.rowStats. */
  private[operators] def rowStatsUnrolled(filtered: DataFrame, outcome: String,
      d: Design, fits: Map[String, Ols.Fit]): DataFrame = {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val spark = filtered.sparkSession
    val p = d.p
    val schema = StructType(
      Seq(StructField("__key", StringType, nullable = false),
        StructField("__dfe", DoubleType, nullable = false),
        StructField("__s2", DoubleType, nullable = false),
        StructField("__rank", IntegerType, nullable = false)) ++
      (0 until p).map(i => StructField(s"__b_$i", DoubleType, nullable = false)) ++
      (for (i <- 0 until p; j <- 0 until p)
        yield StructField(s"__a_${i}_$j", DoubleType, nullable = false)))
    val rows: Seq[org.apache.spark.sql.Row] = fits.toSeq.map { case (k, f) =>
      org.apache.spark.sql.Row.fromSeq(
        k +: f.dfe +: f.s2 +: f.rank +: (f.beta.toSeq ++ f.xtxInv.toSeq))
    }
    val fitDf = spark.createDataFrame(rows.asJava, schema)
    val xs = featureCols(d)
    val y = col(outcome).cast("double")
    val nan = lit(Double.NaN)
    // ŷ = Σᵢ xᵢβᵢ, h = Σᵢ xᵢ·(Σⱼ Aᵢⱼxⱼ) — left-associated like the loop form
    val pred = xs.zipWithIndex.map { case (x, i) => x * col(s"__b_$i") }.reduce(_ + _)
    val hRaw = xs.zipWithIndex.map { case (xi, i) =>
      xi * xs.zipWithIndex.map { case (xj, j) => col(s"__a_${i}_$j") * xj }.reduce(_ + _)
    }.reduce(_ + _)
    val out = filtered
      .join(broadcast(fitDf), Seq("__key")) // inner: rows without a fit drop
      .withColumn("resid", y - pred)
      .withColumn("leverage", least(greatest(hRaw, lit(0.0)), lit(1.0 - 1e-12)))
      .withColumn("__s2i",
        (col("__dfe") * col("__s2") - col("resid") * col("resid") / (lit(1.0) - col("leverage"))) /
          (col("__dfe") - 1))
      .withColumn("rstudent",
        when(col("__dfe") <= 1 || isnan(col("__s2")), nan)
          .when(col("__s2i") <= 0, nan)
          .otherwise(col("resid") / sqrt(col("__s2i") * (lit(1.0) - col("leverage")))))
      .withColumn("cookd",
        when(isnan(col("__s2")) || col("__s2") <= 0, nan)
          .otherwise(col("resid") * col("resid") * col("leverage") /
            (col("__rank") * col("__s2") * (lit(1.0) - col("leverage")) * (lit(1.0) - col("leverage")))))
      .withColumn("dfe", col("__dfe"))
      .withColumn("s2", col("__s2"))
    out.select((filtered.columns ++
      Seq("resid", "leverage", "rstudent", "cookd", "dfe", "s2")).map(col): _*)
  }

  /** Fallback for wide designs: per-row UDF over the broadcast fit map. */
  private[operators] def rowStatsUdf(filtered: DataFrame, outcome: String,
      d: Design, fits: Map[String, Ols.Fit]): DataFrame = {
    val bc = filtered.sparkSession.sparkContext.broadcast(fits)
    val statUdf = udf((key: String, feats: Seq[Double], yv: Double) => {
      bc.value.get(key) match {
        case Some(fit) =>
          val (e, h, rs, cd) = Ols.rowStats(fit, feats.toArray, yv)
          Some((e, h, rs, cd, fit.dfe, fit.s2))
        case None => None
      }
    })
    filtered
      .withColumn("__feats", array(featureCols(d): _*))
      .withColumn("__st", statUdf(col("__key"), col("__feats"), col(outcome).cast("double")))
      .filter(col("__st").isNotNull)
      .withColumn("resid", col("__st._1"))
      .withColumn("leverage", col("__st._2"))
      .withColumn("rstudent", col("__st._3"))
      .withColumn("cookd", col("__st._4"))
      .withColumn("dfe", col("__st._5"))
      .withColumn("s2", col("__st._6"))
      .drop("__st", "__feats")
  }
}
