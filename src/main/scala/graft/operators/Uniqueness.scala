package graft.operators

import graft.checks.{Results, UniquenessCheck}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-uniqueness at web scale.
  *
  * Plan shape: `groupBy(keys).count.filter(count > 1)`. Spark's hash
  * aggregate does map-side partial aggregation, so each executor emits at
  * most one (key, partial-count) row per distinct local key — the shuffle
  * carries distinct keys, not rows. Skewed hot keys (one url crawled
  * millions of times) are exactly the keys we must report, and partial agg
  * collapses them to one row per map task; AQE skew-join handling is not
  * needed for the agg itself. Violation listing is capped to avoid driver /
  * sink blowups on pathological tables.
  */
object Uniqueness {

  /** Per-duplicate-key frame: keys, scope, dup count. */
  def duplicateKeys(df: DataFrame, check: UniquenessCheck): DataFrame = {
    val groupCols = (check.scope ++ check.keys).distinct
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)
  }

  def verdicts(df: DataFrame, check: UniquenessCheck): DataFrame = {
    val dups = duplicateKeys(df, check)
    val scoped =
      if (check.scope.isEmpty) dups.groupBy()
      else dups.groupBy(check.scope.map(col): _*)
    val agg = scoped.agg(
      coalesce(sum(col("dup_count") - 1), lit(0L)).as("extra_rows"),
      count(lit(1)).as("dup_key_count"))
    val framed = agg.select(
      Results.partitionString(check.scope).as("partition"),
      lit("duplicate_extra_rows").as("metric"),
      col("extra_rows").cast("double").as("stat"),
      lit(check.maxDuplicates.toDouble).as("threshold"),
      col("dup_key_count").as("n_obs"),
      (col("extra_rows") <= check.maxDuplicates).as("pass"))
    // a scope with zero dups yields no agg row when scope is non-empty —
    // that's a pass-by-absence; global scope always yields one row.
    Results.toVerdicts(framed, check.id, check.severity)
  }

  def violations(df: DataFrame, check: UniquenessCheck, limit: Int = 10000): DataFrame = {
    val v = duplicateKeys(df, check).limit(limit).select(
      concat_ws("|", check.keys.map(c => col(c).cast("string")): _*).as("key"),
      Results.partitionString(check.scope).as("partition"),
      col("dup_count").cast("string").as("observed"),
      lit("1").as("expected"),
      lit("duplicate key").as("label"))
    Results.toViolations(v, check.id)
  }
}
