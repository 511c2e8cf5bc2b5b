package graft

import graft.engine.Runner
import graft.queries.Flagship
import graft.sources.Pages
import org.apache.spark.sql.SparkSession

/** A/B probe: suite output as two actions (verdicts then violations) vs
  * one unified action — same JVM, alternating reps. SPARK_GRAFT_CACHE=off
  * reproduces the ScalingBench scan-proxy regime (lazy generator input,
  * no input cache); default is the cached-input regime. */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val nPages = sys.env.getOrElse("SPARK_GRAFT_PAGES", "2000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val cacheInput = !sys.env.get("SPARK_GRAFT_CACHE").contains("off")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.graft.cache.input", cacheInput)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pages = Pages.generate(spark, nPages, numPartitions = cpus.toInt * 4)
    if (cacheInput) pages.cache().count()
    val suite = Flagship.suite(spark)
    def runOnce(unified: Boolean): Double = {
      spark.sharedState.cacheManager.clearCache()
      if (cacheInput) pages.cache().count()
      val t0 = System.nanoTime()
      val res = Runner.run(pages, suite)
      if (unified) res.unified.write.format("noop").mode("overwrite").save()
      else {
        res.verdicts.write.format("noop").mode("overwrite").save()
        res.violations.write.format("noop").mode("overwrite").save()
      }
      (System.nanoTime() - t0) / 1e9
    }
    runOnce(false); runOnce(true) // warmup
    (1 to reps).foreach { rep =>
      Seq(false, true).foreach { unified =>
        val s = runOnce(unified)
        println(f"[write] rep=$rep unified=$unified%-5s suite=${s}%7.2f s")
      }
    }
    spark.stop()
  }
}
