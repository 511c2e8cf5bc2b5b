package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level diagnostic for a single model family's fixed cost — built
  * for the round-5 scaling investigation: the per-family ScalingBench
  * probe showed `chars_regression` costing ~46 s at BOTH 8 and 32 cores
  * on 1 M pages (a serial cost), and a serial fixed cost is what sinks
  * the north-rule pair at feasible page counts. This main times each
  * phase of the family separately so the serial component is
  * attributable. SPARK_GRAFT_CPUS / SPARK_GRAFT_PAGES control the run.
  */
object FamilyProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nPages = sys.env.getOrElse("SPARK_GRAFT_PAGES", "1000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.graft.cache.input", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val pages = graft.sources.Pages.generate(spark, nPages, numPartitions = cpus * 4)
    t("gen_count_cold")(pages.count())
    t("gen_count_warm")(pages.count())
    val check = graft.checks.RegressionOutlierCheck("chars_regression", "n_chars", "url",
      contCovariates = Seq("score"), scope = Seq("host_bucket"),
      cutoffPct = 99.9, cookCutoff = Some(7.0))
    val pruned = pages.select(col("n_chars"), col("url"), col("score"), col("host_bucket"))
    t("pruned_count")(pruned.count())
    val d = t("design")(graft.operators.OlsPass.design(pruned, check.contCovariates, check.discCovariates))
    val fits = t("gram_fit_cold")(graft.operators.OlsPass.fitPerGroup(pruned, check.outcome, d, check.scope))
    t("gram_fit_warm")(graft.operators.OlsPass.fitPerGroup(pruned, check.outcome, d, check.scope))
    println(s"[probe] groups=${fits.size}")
    val flagged = t("flagged_build")(graft.operators.RegressionOutlier.flagged(pruned, check))
    t("flagged_write_cold")(flagged.write.format("noop").mode("overwrite").save())
    t("flagged_write_warm")(flagged.write.format("noop").mode("overwrite").save())
    val f2 = graft.operators.RegressionOutlier.flagged(pruned, check)
    val v = t("verdicts_build")(graft.operators.RegressionOutlier.verdictsFrom(f2, check))
    t("verdicts_write")(v.write.format("noop").mode("overwrite").save())
    val vi = t("violations_build")(graft.operators.RegressionOutlier.violationsFrom(f2, check))
    t("violations_write")(vi.write.format("noop").mode("overwrite").save())
    // the Runner path exactly as ScalingBench families mode drives it —
    // at 32 cores this measured ~48 s while the phase sum above accounts
    // for only ~17 s; the bisection below attributes the difference
    val suite = graft.queries.Flagship.suiteOf(spark, Seq(check))
    t("runner_unified_cold") {
      graft.engine.Runner.run(pages, suite)
        .unified.write.format("noop").mode("overwrite").save()
    }
    t("runner_unified_warm") {
      graft.engine.Runner.run(pages, suite)
        .unified.write.format("noop").mode("overwrite").save()
    }
    val rr = t("runner_build")(graft.engine.Runner.run(pages, suite))
    t("runner_verdicts_only")(rr.verdicts.write.format("noop").mode("overwrite").save())
    t("runner_violations_only")(rr.violations.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
