package graft

import graft.engine.Runner
import graft.queries.Flagship
import graft.sources.Pages
import org.apache.spark.sql.SparkSession

/** A/B probe for AQE's share of the suite's fixed cost: ONE JVM, ONE
  * parquet-backed input, alternating `spark.sql.adaptive.enabled` between
  * suite runs. AQE re-optimizes at every exchange; on the suite's ~50
  * KB-sized reduced-frame stages that re-planning is pure latency, while
  * at the 10^12-row grain it is what splits skewed shuffles — this probe
  * quantifies the former so the default (AQE on, per the north rule's
  * skew handling) is a measured tradeoff, not a guess.
  */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val nPages = sys.env.getOrElse("SPARK_GRAFT_PAGES", "2000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = s"/tmp/fuseprobe_pages_$nPages" // shared with FuseProbe
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.graft.cache.input", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (!new java.io.File(dir, "_SUCCESS").exists())
      Pages.generate(spark, nPages, numPartitions = cpus.toInt * 4)
        .write.mode("overwrite").parquet(dir)
    val pages = spark.read.parquet(dir)
    val suite = Flagship.suite(spark)
    def runOnce(aqe: Boolean): Double = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      Runner.run(pages, suite)
        .unified.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    runOnce(true); runOnce(false) // warmup both paths (untimed)
    (1 to reps).foreach { rep =>
      Seq(true, false).foreach { aqe =>
        val s = runOnce(aqe)
        println(f"[aqe] rep=$rep aqe=$aqe%-5s suite=${s}%7.2f s")
      }
    }
    spark.stop()
  }
}
