package graft

import graft.checks._
import graft.engine.Runner
import graft.queries.Flagship
import graft.sources.Pages
import org.apache.spark.sql.SparkSession

/** Dev profiling harness: per-check-family wall times on the pages table. */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nPages = sys.env.getOrElse("SPARK_GRAFT_PAGES", "2000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val pages = Pages.generate(spark, nPages, numPartitions = cpus.toInt * 4)
    time("generate+cache")(pages.cache().count())
    val suite = Flagship.suite(spark)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    suite.checks.foreach {
      case c: ColumnStatsCheck =>
        time(s"${c.id} verdicts")(noop(
          graft.operators.ColumnStats.verdicts(
            graft.operators.ColumnStats.profile(pages, Seq(c)), Seq(c))))
      case c: UniquenessCheck =>
        time(s"${c.id} verdicts")(noop(graft.operators.Uniqueness.verdicts(pages, c)))
        time(s"${c.id} violations")(noop(graft.operators.Uniqueness.violations(pages, c)))
      case c: ReferentialCheck =>
        val ref = suite.refTables(c.refTable)
        time(s"${c.id} verdicts")(noop(graft.operators.Referential.verdicts(pages, ref, c, "url")))
        time(s"${c.id} violations")(noop(graft.operators.Referential.violations(pages, ref, c, "url")))
      case c: CategoricalConsistencyCheck =>
        time(s"${c.id} verdicts")(noop(graft.operators.CategoricalConsistency.verdicts(pages, c)))
        time(s"${c.id} violations")(noop(graft.operators.CategoricalConsistency.violations(pages, c)))
      case c: DigitPreferenceCheck =>
        time(s"${c.id} verdicts")(noop(graft.operators.DigitPreference.verdicts(pages, c)))
        time(s"${c.id} violations")(noop(graft.operators.DigitPreference.violations(pages, c)))
      case c: DriftCheck =>
        time(s"${c.id} verdicts")(noop(graft.operators.Drift.verdicts(pages, c)))
        time(s"${c.id} violations")(noop(graft.operators.Drift.violations(pages, c)))
      case c: ByteIdentityCheck =>
        time(s"${c.id} verdicts")(noop(graft.operators.ByteIdentity.verdicts(pages, c)))
        time(s"${c.id} violations")(noop(graft.operators.ByteIdentity.violations(pages, c)))
      case other =>
        time(s"${other.id}")(noop(Runner.run(pages, Runner.Suite(Seq(other),
          suite.refTables, suite.keyCol)).verdicts))
    }
    time("full Runner.run") {
      val res = Runner.run(pages, suite)
      noop(res.verdicts); noop(res.violations)
    }
    spark.stop()
  }
}
