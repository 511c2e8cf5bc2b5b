package graft.operators

import graft.checks.{ColumnStatsCheck, Results}
import graft.stats.KllSketchAgg
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass per-column profile + threshold verdicts.
  *
  * ALL ColumnStatsChecks sharing a scope fuse into ONE aggregation pass
  * (SURVEY.md §4 "fuse all per-column stats checks"): for each checked
  * column the pass computes count/nulls/min/max/mean/stddev, an HLL distinct
  * sketch (builtin hll_sketch_agg — mergeable binary) and a KLL quantile
  * sketch (custom mergeable aggregate). The grouped result is KB-sized per
  * partition; quantile extraction and verdict logic run on that reduced
  * frame, never on raw rows. At 10^12 rows this is one shuffle of
  * (scope-cardinality × checked-columns) sketch rows.
  */
object ColumnStats {

  /** Per-scope fused stats frame: one row per scope tuple, one struct per column. */
  def profile(df: DataFrame, checks: Seq[ColumnStatsCheck]): DataFrame = {
    require(checks.nonEmpty)
    val scope = checks.head.scope
    require(checks.forall(_.scope == scope), "fuse only within one scope")
    val aggs: Seq[Column] = checks.flatMap { c =>
      val v = col(c.column)
      val num = v.cast("double")
      Seq(
        count(lit(1)).as(s"${c.column}__n"),
        count(v).as(s"${c.column}__n_nonnull"),
        min(num).as(s"${c.column}__min"),
        max(num).as(s"${c.column}__max"),
        avg(num).as(s"${c.column}__mean"),
        stddev_samp(num).as(s"${c.column}__std"),
        approx_count_distinct(v).as(s"${c.column}__distinct"),
        KllSketchAgg.sketch(num).as(s"${c.column}__kll"))
    }
    val deduped = aggs.groupBy(_.toString).map(_._2.head).toSeq // same col in 2 checks → once
    val grouped =
      if (scope.isEmpty) df.groupBy() else df.groupBy(scope.map(col): _*)
    grouped.agg(deduped.head, deduped.tail: _*)
      .withColumn("partition", Results.partitionString(scope))
  }

  /** Verdicts for every bound asserted by every check, from the profiled frame. */
  def verdicts(profiled: DataFrame, checks: Seq[ColumnStatsCheck]): DataFrame = {
    val spark = profiled.sparkSession
    val qUdf = udf((bytes: Array[Byte], q: Double) =>
      if (bytes == null) Double.NaN else KllSketchAgg.quantiles(bytes, Array(q))(0))
    val frames = checks.flatMap { c =>
      val base = profiled.select(
        col("partition"),
        col(s"${c.column}__n").as("n"),
        col(s"${c.column}__n_nonnull").as("nn"),
        col(s"${c.column}__min").as("mn"),
        col(s"${c.column}__max").as("mx"),
        col(s"${c.column}__distinct").as("nd"),
        col(s"${c.column}__kll").as("kll"))
      val checksHere = Seq.newBuilder[DataFrame]
      c.maxMissingFrac.foreach { thr =>
        checksHere += base.select(col("partition"),
          lit("missing_frac").as("metric"),
          (lit(1.0) - col("nn") / col("n")).as("stat"),
          lit(thr).as("threshold"), col("n").as("n_obs"),
          ((lit(1.0) - col("nn") / col("n")) <= thr).as("pass"))
      }
      c.minAllowed.foreach { lo =>
        checksHere += base.select(col("partition"), lit("min").as("metric"),
          col("mn").as("stat"), lit(lo).as("threshold"), col("nn").as("n_obs"),
          (col("mn").isNull || col("mn") >= lo).as("pass"))
      }
      c.maxAllowed.foreach { hi =>
        checksHere += base.select(col("partition"), lit("max").as("metric"),
          col("mx").as("stat"), lit(hi).as("threshold"), col("nn").as("n_obs"),
          (col("mx").isNull || col("mx") <= hi).as("pass"))
      }
      c.minDistinct.foreach { lo =>
        checksHere += base.select(col("partition"), lit("distinct_min").as("metric"),
          col("nd").cast("double").as("stat"), lit(lo.toDouble).as("threshold"),
          col("nn").as("n_obs"), (col("nd") >= lo).as("pass"))
      }
      c.maxDistinct.foreach { hi =>
        checksHere += base.select(col("partition"), lit("distinct_max").as("metric"),
          col("nd").cast("double").as("stat"), lit(hi.toDouble).as("threshold"),
          col("nn").as("n_obs"), (col("nd") <= hi).as("pass"))
      }
      c.quantileBounds.foreach { case (q, lo, hi) =>
        val qv = qUdf(col("kll"), lit(q))
        checksHere += base.select(col("partition"), lit(s"q$q").as("metric"),
          qv.as("stat"), lit(hi).as("threshold"), col("nn").as("n_obs"),
          (qv.isNaN || (qv >= lo && qv <= hi)).as("pass"))
      }
      checksHere.result().map(f => Results.toVerdicts(f, c.id, c.severity))
    }
    frames.reduceOption(_ unionByName _).getOrElse(Results.emptyVerdicts(spark))
  }
}
