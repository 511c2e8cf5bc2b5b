package graft

import org.apache.spark.sql.SparkSession

/** Dev benchmark (round 6, guide §1.4): times NAMED declared queries in
  * isolation with the noop sink, several reps each, same session shape as
  * graft.Bench (local[$SPARK_GRAFT_CPUS], shuffle.partitions=cpus, AQE on,
  * one untimed warmup action). Does NOT replace graft.Bench — that harness
  * is frozen; this exists so per-query before/after deltas can be measured
  * without paying the full suite per iteration.
  *
  * Usage: runMain graft.BenchExtra <reps> <name> [<name> ...]
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val names = args.drop(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def loadavg1: Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val specs = SparkEntry.allSpecs.filter(s => names.contains(s.name))
    // untimed warmup (JIT/codegen)
    specs.headOption.foreach { s =>
      try s.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    specs.foreach { spec =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(spec.name)
        spec.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[bx] ${spec.name}%-28s min=${ts.min}%6.3f reps=${ts.map(t => f"$t%.3f").mkString(",")} load=${loadavg1}%.1f")
    }
    spark.stop()
  }
}
