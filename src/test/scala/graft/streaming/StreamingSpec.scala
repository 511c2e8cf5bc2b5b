package graft.streaming

import graft.SparkSpec
import graft.sources.Pages
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming checks: a pages micro-batch stream driven synchronously;
  * streamed window aggregates must equal the batch computation on the same
  * rows (streaming ≡ batch invariant). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("windowed profile over a stream equals the batch computation") {
    val pages = Pages.generate(spark, 5000)
      .select(col("warc_ts"), col("score")).collect()

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Double)]
    val streamDf = stream.toDF().toDF("warc_ts", "score")
    val agg = StreamingChecks.windowedProfile(streamDf, "warc_ts", "score", "30 days")
    stream.addData(pages.map(r => (r.getTimestamp(0), r.getDouble(1))).toSeq)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("prof")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("prof").collect()
      .map(r => r.getTimestamp(0).toString ->
        (r.getLong(2), math.round(r.getDouble(4) * 1e6))).toMap
    val batch = StreamingChecks.windowedProfile(
      Pages.generate(spark, 5000).select(col("warc_ts"), col("score")),
      "warc_ts", "score", "30 days").collect()
      .map(r => r.getTimestamp(0).toString ->
        (r.getLong(2), math.round(r.getDouble(4) * 1e6))).toMap
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup keeps first arrival per fingerprint within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String, String)]
    val df = stream.toDF().toDF("ts", "id", "text")
    val deduped = StreamingChecks.streamingDedup(df, "ts", "text", "1 day")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup").start()
    val t = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-05 06:00:00")
    stream.addData(Seq((t, "a", "same page"), (t, "b", "same page"), (t, "c", "other")))
    q.processAllAvailable()
    // duplicate arriving in a LATER micro-batch, still inside the horizon
    stream.addData(Seq((t2, "d", "same page"), (t2, "e", "third")))
    q.processAllAvailable(); q.stop()
    val kept = spark.table("dedup").collect().map(_.getString(1)).toSet
    assert(kept.intersect(Set("a", "b")).size == 1, s"one of the dups kept: $kept")
    assert(!kept.contains("d"), "cross-batch duplicate inside the horizon dropped")
    assert(kept.contains("c") && kept.contains("e"))
    // batch surface: same call on a static frame dedups identically AND
    // keeps the earliest-ts row per fingerprint (first-arrival parity)
    val batchRows = StreamingChecks.streamingDedup(
      Seq((t2, "d", "same page"), (t, "a", "same page"), (t2, "e", "third"))
        .toDF("ts", "id", "text"), "ts", "text").collect()
    assert(batchRows.length == 2)
    assert(batchRows.map(_.getString(1)).toSet == Set("a", "e"),
      "batch branch keeps the min-ts row per fingerprint, not an arbitrary one")
  }

  test("windowed frequencies + verdicts run in append mode with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String, String)]
    val df = stream.toDF().toDF("warc_ts", "host", "lang")
    val freq = StreamingChecks.windowedFrequencies(df, "warc_ts", "host", "lang", "7 days")
    val q = freq.writeStream.outputMode("append")
      .format("memory").queryName("freqs").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    val late = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    val later = java.sql.Timestamp.valueOf("2024-05-01 00:00:00")
    stream.addData(Seq((t0, "h1", "en"), (t0, "h1", "en"), (t0, "h2", "de")))
    q.processAllAvailable()
    stream.addData(Seq((late, "h1", "fr"))) // advances the watermark past t0's window
    q.processAllAvailable()
    stream.addData(Seq((later, "h2", "en"))) // next batch emits the closed window
    q.processAllAvailable(); q.stop()
    val rows = spark.table("freqs").collect()
    assert(rows.exists(r => r.getString(1) == "h1" && r.getString(2) == "en" && r.getLong(3) == 2))
  }
}
