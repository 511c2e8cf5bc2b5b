package graft.queries

import graft.checks._
import graft.engine.Runner
import graft.sources.Pages
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Flagship entry: the full validation suite over the synthetic
  * Common-Crawl-style pages table (the north-rule workload) — verdict rows
  * out. Small scale here (driver smoke only); Bench runs the same suite at
  * benchmark scale.
  */
object Flagship {

  def suite(spark: SparkSession): Runner.Suite = Runner.Suite(
    checks = Seq(
      ColumnStatsCheck("score_stats", "score",
        maxMissingFrac = Some(0.0), minAllowed = Some(0.0), maxAllowed = Some(100.0),
        quantileBounds = Seq((0.5, 20.0, 80.0))),
      UniquenessCheck("unique_url", Seq("url")),
      ReferentialCheck("host_registered", "host_id", "hosts", "host_id"),
      // pairwise=true + holmPooled=true adds the reference's heat-map pair
      // grid (q54/q55 exercise it); it rides the same fused cell scan but
      // its C(k,2) reduced-frame stages add ~15 s of fixed stage latency
      // per suite run at local[32] bench scale, so the flagship keeps the
      // one-vs-rest default and the grid stays opt-in
      CategoricalConsistencyCheck("lang_consistency", "lang", "host_bucket",
        dateCol = Some("warc_ts"), interval = "quarter", alphaBar = 0.05),
      DigitPreferenceCheck("score_digits", "score", place = 0.1,
        groupCol = "host_id", alpha = 1e-4, minNum = 50),
      DriftCheck("score_drift", "score", "warc_ts", interval = "quarter", alpha = 0.001),
      ByteIdentityCheck("text_bytes", "url", "text")),
    refTables = Map("hosts" -> Pages.hosts(spark)),
    keyCol = "url")

  def verdicts(spark: SparkSession): DataFrame =
    Runner.run(Pages.generate(spark, 20000), suite(spark)).verdicts
}
