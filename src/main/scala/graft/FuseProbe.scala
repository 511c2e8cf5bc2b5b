package graft

import graft.engine.Runner
import graft.queries.Flagship
import graft.sources.Pages
import org.apache.spark.sql.SparkSession

/** Dev A/B harness for the suite fusion knobs: ONE JVM, ONE parquet-backed
  * input (written once, served from the OS page cache), alternating
  * fused/unfused suite runs with the input cache OFF — so every check
  * family's pass re-scans parquet exactly like a cluster executor would,
  * and the fused-vs-unfused scan-count difference is what gets measured.
  * clearCache() between runs drops the per-run reduced-frame caches
  * (phase1/phase2/cells) so each run recomputes its own.
  *
  * SPARK_GRAFT_AB=cells|keyscan|all selects which fusion to toggle.
  */
object FuseProbe {
  def main(args: Array[String]): Unit = {
    val nPages = sys.env.getOrElse("SPARK_GRAFT_PAGES", "10000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ab = sys.env.getOrElse("SPARK_GRAFT_AB", "all")
    val dir = s"/tmp/fuseprobe_pages_$nPages"
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
    def setKnobs(fused: Boolean): Unit = {
      val v = fused.toString
      if (ab == "cells" || ab == "all") spark.conf.set("spark.graft.fuse.cells", v)
      if (ab == "keyscan" || ab == "all") spark.conf.set("spark.graft.fuse.keyscan", v)
    }
    def runOnce(fused: Boolean): Double = {
      setKnobs(fused)
      spark.sharedState.cacheManager.clearCache() // fresh reduced-frame caches
      val t0 = System.nanoTime()
      Runner.run(pages, suite)
        .unified.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    runOnce(true); runOnce(false) // warmup both paths (untimed)
    (1 to reps).foreach { rep =>
      Seq(false, true).foreach { fused =>
        val s = runOnce(fused)
        println(f"[ab] rep=$rep fused($ab)=$fused%-5s suite=${s}%7.2f s")
      }
    }
    spark.stop()
  }
}
