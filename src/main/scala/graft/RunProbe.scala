package graft

import graft.engine.Runner
import graft.queries.Flagship
import org.apache.spark.sql.SparkSession

/** Dev: attribute each suite leg's wall between the Runner BUILD phase
  * (plan construction, which includes every operator's eager driver
  * actions — Gram collects, Σ̂ collect, dedup candidate counts) and the
  * single unified noop ACTION. If build dominates, the per-check builds
  * are independent and can overlap (guide §2.6); if the action dominates,
  * the lever is the plan itself. */
object RunProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nPages = sys.env.getOrElse("SPARK_GRAFT_PAGES", "2000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val pages = graft.sources.Pages.generate(spark, nPages, numPartitions = cpus * 4)
    pages.cache().count()
    val legs: Seq[(String, Seq[graft.checks.Check])] = Seq(
      "core" -> Flagship.coreChecks,
      "full" -> (Flagship.coreChecks ++ Flagship.modelChecks ++ Flagship.dedupChecks)) ++
      Flagship.modelChecks.map(c => c.id -> Seq(c)) ++
      Seq("near_dup" -> Flagship.dedupChecks)
    // executor-core occupancy during each phase: Σ task run time / (wall ×
    // cores). Low occupancy = scheduling/codegen latency, not compute.
    val runTime = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) runTime.addAndGet(te.taskMetrics.executorRunTime)
    })
    def occ(wall: Double, t0: Long, t1: Long): Double =
      (t1 - t0) / 1000.0 / (wall * cpus)
    legs.foreach { case (name, cs) =>
      graft.engine.CacheTracker.scope {
        val r0 = runTime.get()
        val (res, tBuild) = t(Runner.run(pages, Flagship.suiteOf(spark, cs)))
        val r1 = runTime.get()
        val (_, tAct) = t(
          res.unified.write.format("noop").mode("overwrite").save())
        val r2 = runTime.get()
        println(f"[rp] $name%-22s build=$tBuild%6.2f s (occ ${occ(tBuild, r0, r1)}%4.2f)" +
          f"  action=$tAct%6.2f s (occ ${occ(tAct, r1, r2)}%4.2f)")
      }
    }
    spark.stop()
  }
}
