package graft

import graft.engine.Runner
import graft.queries.Flagship
import org.apache.spark.sql.SparkSession

/** Dev: alternated A/B of the Runner's parallel check build
  * (spark.graft.build.threads) on the FULL suite in ONE JVM, so codegen
  * cache state and host tenancy hit both arms equally. */
object BuildParProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nPages = sys.env.getOrElse("SPARK_GRAFT_PAGES", "2000000").toLong
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pages = graft.sources.Pages.generate(spark, nPages, numPartitions = cpus * 4)
    pages.cache().count()
    def leg(threads: String): Double = {
      spark.conf.set("spark.graft.build.threads", threads)
      val t0 = System.nanoTime()
      graft.engine.CacheTracker.scope {
        Runner.run(pages, Flagship.suite(spark))
          .unified.write.format("noop").mode("overwrite").save()
      }
      (System.nanoTime() - t0) / 1e9
    }
    leg("1") // untimed warmup (codegen)
    (1 to reps).foreach { i =>
      // alternate arm order per rep so JIT/idle drift cancels across reps
      val (s, p) =
        if (i % 2 == 1) { val s = leg("1"); val p = leg("8"); (s, p) }
        else { val p = leg("8"); val s = leg("1"); (s, p) }
      println(f"[bp] rep $i seq=$s%6.2f s  par=$p%6.2f s")
    }
    spark.stop()
  }
}
