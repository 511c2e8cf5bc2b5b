package graft

import graft.checks._
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-6 phase attribution for the suite's family legs at bench scale:
  * times each stage of the un-panel and core-check lineages separately
  * over the SAME cached pages frame the bench uses, so a family's
  * breakdown number decomposes into attributable phases. */
object SuiteProbe {
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
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[sp] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val pages = graft.sources.Pages.generate(spark, nPages, numPartitions = cpus * 4)
    t("pages cache+count")(pages.cache().count())

    // ---- un_panel family ----
    val upc = UnPanelCheck("score_un_panel", "score", idCol = "host_id",
      dateCol = Some("warc_ts"), interval = "quarter", cutoffPct = 99.9)
    val (dfp, cfg) = UnPanelOutlier.prepared(pages, upc)
    val cell = t("up cell groupBy")( {
      val c = dfp.filter(col(cfg.outcome).isNotNull && col(cfg.slotCol).isNotNull &&
          col(cfg.idCol).isNotNull)
        .withColumn("__key", lit(""))
        .groupBy(col("__key"), col(cfg.idCol).as("__subjN"), col(cfg.slotCol).as("__slot"))
        .agg(avg(col(cfg.outcome).cast("double")).as("__y"))
      noop(c); c
    })
    t("up scored+verdict noop")( {
      val sc = UnPanelOutlier.scored(dfp, cfg)
      noop(UnPanelOutlier.verdictsFrom(sc, cfg))
    })

    // ---- core components ----
    t("colstats profile")( {
      val cs = Seq(ColumnStatsCheck("score_stats", "score",
        maxMissingFrac = Some(0.0), minAllowed = Some(0.0), maxAllowed = Some(100.0),
        quantileBounds = Seq((0.5, 20.0, 80.0))))
      noop(ColumnStats.verdicts(ColumnStats.profile(pages, cs), cs))
    })
    t("keyscan p1+p2")( {
      val p1 = KeyScan.phase1(pages, Seq("url"), "text")
      noop(KeyScan.phase2(pages, Seq("url"), "text", p1))
    })
    t("cellscan fused")( {
      val cat = CategoricalConsistencyCheck("lang_consistency", "lang", "host_bucket",
        dateCol = Some("warc_ts"), interval = "quarter", alphaBar = 0.05)
      val dig = DigitPreferenceCheck("score_digits", "score", place = 0.1,
        groupCol = "host_id", alpha = 1e-4, minNum = 50)
      val dr = DriftCheck("score_drift", "score", "warc_ts", interval = "quarter", alpha = 0.001)
      var base = pages.crossJoin(broadcast(Drift.edgesMulti(pages, Seq((dr, "__dr0_mn", "__dr0_w")))))
      val fams = Seq(CategoricalConsistency.cellFamily(cat),
        DigitPreference.cellFamily(dig), Drift.cellFamily(dr, "__dr0_mn", "__dr0_w"))
      noop(CellScan.counts(base, fams))
    })
    t("referential")( {
      val rc = ReferentialCheck("host_registered", "host_id", "hosts", "host_id")
      noop(Referential.verdicts(pages, graft.sources.Pages.hosts(spark), rc, "url"))
    })

    // ---- near-dup decomposition on the cached pages ----
    t("nd sig pass (fp+sim)")( {
      noop(pages.select(col("url").cast("string").as("id"),
        graft.functions.TextFunctions.fingerprint(col("text")).as("fp"),
        graft.functions.SimHash64.ofText(col("text")).as("sim")))
    })
    t("nd full drops")( {
      val (sig, drops, _) = Dedup.nearDupSurfaces(pages, "url", "text")
      noop(drops); sig.unpersist()
    })
    spark.stop()
  }
}
