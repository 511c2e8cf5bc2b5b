package graft

import graft.checks._
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev: bisect check-pipeline cost on 2M pages. */
object GenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val pages = graft.sources.Pages.generate(spark, 2000000, 128)
    time("cache pages")(pages.cache().count())

    val cc = CategoricalConsistencyCheck("cc", "lang", "host_bucket",
      dateCol = Some("warc_ts"), interval = "quarter", alphaBar = 0.05)
    time("raw groupBy count")(
      pages.withColumn("panel", PanelBins.panel(col("warc_ts"), "quarter"))
        .groupBy("panel", "host_bucket", "lang").count()
        .write.format("noop").mode("overwrite").save())
    time("cc.cells")(CategoricalConsistency.cells(pages, cc)
      .write.format("noop").mode("overwrite").save())
    time("cc.tests")(CategoricalConsistency.tests(pages, cc)
      .write.format("noop").mode("overwrite").save())
    time("cc.verdicts")(CategoricalConsistency.verdicts(pages, cc)
      .write.format("noop").mode("overwrite").save())
    time("cc.violations")(CategoricalConsistency.violations(pages, cc)
      .write.format("noop").mode("overwrite").save())

    val dp = DigitPreferenceCheck("dp", "score", place = 0.1,
      groupCol = "host_id", alpha = 1e-4, minNum = 50)
    time("digitAt only")(
      pages.select(DigitPreference.digitAt(col("score"), 0.1).as("d"))
        .groupBy("d").count().write.format("noop").mode("overwrite").save())
    time("dp.digitCounts")(DigitPreference.digitCounts(pages, dp)
      .write.format("noop").mode("overwrite").save())
    time("dp.tests")(DigitPreference.tests(pages, dp)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
