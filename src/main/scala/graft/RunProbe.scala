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
    legs.foreach { case (name, cs) =>
      graft.engine.CacheTracker.scope {
        val (res, tBuild) = t(Runner.run(pages, Flagship.suiteOf(spark, cs)))
        val (_, tAct) = t(
          res.unified.write.format("noop").mode("overwrite").save())
        println(f"[rp] $name%-22s build=$tBuild%6.2f s  action=$tAct%6.2f s")
      }
    }
    spark.stop()
  }
}
