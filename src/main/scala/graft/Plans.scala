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

    // ---- round-3/4 lineages ----
    show("exact drop-list, two-phase (hash-agg dup fingerprints -> semi-join -> rank dups only)")(
      Dedup.exactDropList(pages, "url", "text"))
    val (sig, drops, _) = Dedup.nearDupSurfaces(pages, "url", "text")
    show("NearDupCheck drops (ONE cached signature pass; near phase anti-joins exact drops)")(drops)
    sig.unpersist()
    // deterministic synthetic embeddings — plan shape only
    val emb = spark.range(2000).select(col("id"),
      array((1 to 8).map(i => sin(col("id") * i).cast("float")): _*).as("vec"))
    val qs = spark.range(5).select((col("id") + 10000L).as("id"),
      array((1 to 8).map(i => cos(col("id") * i).cast("float")): _*).as("vec"))
    show("multi-probe ANN (corpus single-cell; (bits+1)x explode on the broadcast query side)")(
      Similarity.bucketedTopK(emb, qs, "id", "vec", k = 5, bits = 8, probeHamming = 1))
    val ro = suite.checks.collectFirst { case c: graft.checks.RegressionOutlierCheck => c }.get
    show("regression-outlier flagging (Gram agg -> broadcast cutoffs; UDF-free wide pass)")(
      RegressionOutlier.flagged(pages, ro))
    val imgs = spark.range(64).select(col("id").as("img_id"),
      Multimodal.syntheticPngUdf(col("id"), lit(16), lit(16)).as("bytes"))
    show("image decode feature pass (one scan; per-row decoder is the only UDF)")(
      Multimodal.decodeImages(imgs, "img_id", "bytes"))

    // ---- round-5 lineages ----
    val un = suite.checks.collectFirst { case c: graft.checks.UnPanelCheck => c }.get
    val (unDf, unCfg) = UnPanelOutlier.prepared(pages, un)
    show("type=UN panel scoring (round-5 collapsed slot-index chain)")(
      UnPanelOutlier.scored(unDf, unCfg))
    show("general random= flagging (RandomEffects packed q x q stats, MoM)")(
      LongitudinalOutlier.flagged(
        pages.withColumn("t_day",
          col("warc_ts").cast("double") / 86400.0)
          .withColumn("t_day2", col("t_day") * col("t_day")),
        graft.checks.LongitudinalOutlierCheck("re_plan", "score", "host_id",
          contCovariates = Seq("t_day"), randomTerms = Seq("t_day", "t_day2"))))
    spark.stop()
  }
}
