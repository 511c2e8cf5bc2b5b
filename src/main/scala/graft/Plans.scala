package graft

import graft.checks._
import graft.operators._
import graft.queries.Flagship
import graft.sources.Pages
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: prints the formatted physical plans of the suite's hot
  * lineages (the artifacts BENCH/PLANS.md curates). */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pages = Pages.generate(spark, 10000, numPartitions = 4)
    def show(title: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n===== $title =====")
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    val suite = Flagship.suite(spark)
    val cat = suite.checks.collectFirst { case c: CategoricalConsistencyCheck => c }.get
    val dig = suite.checks.collectFirst { case c: DigitPreferenceCheck => c }.get
    val dr = suite.checks.collectFirst { case c: DriftCheck => c }.get
    val ref = suite.checks.collectFirst { case c: ReferentialCheck => c }.get
    val bi = suite.checks.collectFirst { case c: ByteIdentityCheck => c }.get

    import org.apache.spark.sql.functions._
    val base = pages.crossJoin(broadcast(Drift.edges(pages, dr, "__dr0_mn", "__dr0_w")))
    val fams = Seq(CategoricalConsistency.cellFamily(cat),
      DigitPreference.cellFamily(dig), Drift.cellFamily(dr, "__dr0_mn", "__dr0_w"))
    show("fused CellScan counts (categorical+digit+drift, ONE pass)")(
      CellScan.counts(base, fams))
    val p1 = KeyScan.phase1(pages, Seq(bi.keyCol), bi.column)
    show("fused KeyScan phase 1 (uniqueness+byte-identity candidates)")(p1)
    show("fused KeyScan phase 2 (ONE semi-join + exact groupBy for both checks)")(
      KeyScan.phase2(pages, Seq(bi.keyCol), bi.column, p1))
    show("referential anti-join (broadcast dim)")(
      Referential.orphans(pages, Pages.hosts(spark), ref, suite.keyCol))
    show("column-stats sketch pass (KLL + HLL, one scan)")(
      ColumnStats.profile(pages, suite.checks.collect { case c: ColumnStatsCheck => c }))
    spark.stop()
  }
}
