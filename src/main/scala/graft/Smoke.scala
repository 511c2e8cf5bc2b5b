package graft

import graft.checks._
import graft.engine.Runner
import graft.sources.Pages
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev smoke harness (not part of the driver contract). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pages = Pages.generate(spark, 20000).cache()
    println(s"pages: ${pages.count()}")
    pages.show(3, 60)

    val suite = Runner.Suite(
      checks = Seq(
        ColumnStatsCheck("stats_text_len", "score",
          maxMissingFrac = Some(0.0), minAllowed = Some(0.0), maxAllowed = Some(100.0),
          quantileBounds = Seq((0.5, 20.0, 80.0))),
        UniquenessCheck("unique_url", Seq("url")),
        ReferentialCheck("host_registered", "host_id", "hosts", "host_id"),
        CategoricalConsistencyCheck("lang_consistency", "lang", "host_bucket",
          dateCol = Some("warc_ts"), interval = "quarter", alphaBar = 0.05),
        DigitPreferenceCheck("score_digits", "score", place = 0.1,
          groupCol = "host_id", alpha = 1e-4, minNum = 50),
        DriftCheck("len_drift", "score", "warc_ts", interval = "quarter", alpha = 0.001),
        ByteIdentityCheck("text_bytes", "url", "text")),
      refTables = Map("hosts" -> Pages.hosts(spark)),
      keyCol = "url")

    val res = Runner.run(pages.withColumn("n_chars", length(col("text"))), suite)
    println("== verdicts (failing first) ==")
    res.verdicts.orderBy(col("pass"), col("check_id")).show(40, 80)
    println("== violations sample ==")
    res.violations.groupBy("check_id").count().show()
    res.violations.show(10, 90)
    spark.stop()
  }
}
