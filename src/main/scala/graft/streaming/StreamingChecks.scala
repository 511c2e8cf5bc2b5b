package graft.streaming

import graft.operators.PanelBins
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming surface of the engine: incremental per-window check state over
  * a pages stream (Structured Streaming). The batch engine is authoritative
  * (SURVEY.md §2.10 — the reference is batch-only); this module lets the
  * same column-profile / frequency semantics run continuously on arriving
  * crawl data with watermarked tumbling windows.
  *
  * Design: aggregations are expressed so partial state is mergeable —
  * counts, sums, sum-of-squares per (window, group) — the streaming
  * equivalents of the batch operators' first shuffle. Verdict arithmetic
  * (chi-square vs pooled history, threshold flags) runs on the compact
  * aggregate stream, exactly like the batch plans run on the reduced frame.
  */
object StreamingChecks {

  /** Per-window column profile: count / nulls / mean / m2 (Welford-style
    * via sum + sumsq) for a numeric column, grouped by tumbling window.
    * Works on both streams and batch frames (same lineage). */
  def windowedProfile(pages: DataFrame, tsCol: String, valueCol: String,
      windowLength: String = "7 days", watermark: String = "1 day"): DataFrame = {
    val v = col(valueCol).cast("double")
    val src =
      if (pages.isStreaming) pages.withWatermark(tsCol, watermark) else pages
    src
      .groupBy(window(col(tsCol), windowLength).as("w"))
      .agg(
        count(lit(1)).as("n"),
        count(v).as("n_nonnull"),
        sum(v).as("s"),
        sum(v * v).as("ss"),
        min(v).as("mn"),
        max(v).as("mx"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("n"), col("n_nonnull"), col("s"), col("ss"), col("mn"), col("mx"))
  }

  /** Per-window categorical frequencies (the streaming half of
    * CategoricalConsistency): (window, group, value) counts; the batch
    * verdict pass consumes these like its own first-shuffle output. */
  def windowedFrequencies(pages: DataFrame, tsCol: String, groupCol: String,
      valueCol: String, windowLength: String = "7 days",
      watermark: String = "1 day"): DataFrame = {
    val src =
      if (pages.isStreaming) pages.withWatermark(tsCol, watermark) else pages
    src
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(window(col(tsCol), windowLength).as("w"),
        col(groupCol).as("grp"), col(valueCol).as("value"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("grp"), col("value"), col("cnt"))
  }

  /** Streaming exact-dedup: keep the first arrival per normalized-text
    * fingerprint within the watermark horizon — the continuous counterpart
    * of `Dedup.exactDropList`'s keep-first policy for a crawl feed. State
    * holds one entry per distinct fingerprint inside the horizon
    * (`dropDuplicatesWithinWatermark`) and is evicted as event time
    * advances, so state size is bounded by the horizon's fingerprint
    * cardinality, never by stream length. On a batch frame the same call
    * keeps the earliest-`tsCol` row per fingerprint so the kept-row policy
    * (not just the fingerprint set) matches the streaming first-arrival
    * semantics (streaming ≡ batch surface). */
  def streamingDedup(pages: DataFrame, tsCol: String, textCol: String,
      watermark: String = "1 day"): DataFrame = {
    val withFp = pages.withColumn("fp",
      graft.functions.TextFunctions.fingerprint(col(textCol)))
    if (withFp.isStreaming)
      withFp.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark("fp")
    else withFp
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp").orderBy(col(tsCol))))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Threshold verdicts over a profile stream: missing-fraction and range
    * bounds per window — append-mode safe (pure projection). */
  def profileVerdicts(profile: DataFrame, checkId: String,
      maxMissingFrac: Double, minAllowed: Double, maxAllowed: Double): DataFrame =
    profile.select(
      lit(checkId).as("check_id"),
      col("window_start").cast("string").as("partition"),
      (((col("n") - col("n_nonnull")) / col("n")) <= maxMissingFrac &&
        (col("mn").isNull || col("mn") >= minAllowed) &&
        (col("mx").isNull || col("mx") <= maxAllowed)).as("pass"),
      lit("stream_profile").as("metric"),
      ((col("n") - col("n_nonnull")) / col("n")).as("stat"),
      lit(null).cast("double").as("p_value"),
      lit(maxMissingFrac).as("threshold"),
      col("n").as("n_obs"),
      lit("warn").as("severity"))
}
