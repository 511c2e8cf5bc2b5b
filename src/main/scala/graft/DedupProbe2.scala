package graft

import graft.functions.{SimHash64, TextFunctions => TF}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 fine-grained attribution of the NearDupCheck lineage at bench
  * scale: replicates nearDupSurfaces' internal steps with one action per
  * step so the drops-path wall time decomposes. */
object DedupProbe2 {
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
      println(f"[d2] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val pages = graft.sources.Pages.generate(spark, nPages, numPartitions = cpus * 4)
    t("pages cache+count")(pages.cache().count())

    val sig = pages.select(col("url").cast("string").as("id"),
        TF.fingerprint(col("text")).as("fp"),
        SimHash64.ofText(col("text")).as("sim"))
      .cache()
    t("1 sig cache+count")(sig.count())
    val dupFps = sig.groupBy("fp")
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).select("fp")
    t("2 dupFps agg")(noop(dupFps))
    val w = Window.partitionBy("fp").orderBy(col("id"))
    val exact = sig.join(dupFps, Seq("fp"), "left_semi")
      .withColumn("__rn", row_number().over(w))
      .withColumn("__keep", first("id").over(w))
    val exactDrops = exact.filter(col("__rn") > 1)
      .select(col("id").as("drop_id"), lit("exact").as("reason"),
        col("__keep").as("dup_of"), lit(0).as("hamming")).cache()
    t("3 exactDrops cache")(exactDrops.count())
    val nearInput = sig.join(exactDrops.select(col("drop_id").as("id")),
      Seq("id"), "left_anti")
    t("4 nearInput noop")(noop(nearInput.select("id", "sim")))
    val (pairs, capStats) = graft.operators.Dedup.simhashPairsWithStats(
      nearInput.select("id", "sim"), 3, graft.operators.Dedup.DefaultMaxBucket)
    t("5 pairs noop (incl multi agg)")(noop(pairs))
    val nearDrops = pairs
      .groupBy(col("id_b").as("drop_id"))
      .agg(min(struct(col("hamming"), col("id_a"))).as("__m"))
      .select(col("drop_id"), lit("near").as("reason"),
        col("__m.id_a").as("dup_of"), col("__m.hamming").as("hamming"))
    val drops = exactDrops.unionByName(nearDrops)
    t("6 drops noop")(noop(drops))
    t("7 verdict aggs")( {
      val total = sig.agg(count(lit(1)).cast("double").as("n_total"))
      val d = drops.agg(count(lit(1)).cast("double").as("n_drop"),
        sum(when(col("reason") === "exact", 1L).otherwise(0L)).as("n_exact"))
      noop(total.crossJoin(broadcast(d)))
    })
    t("8 full fresh nearDupSurfaces")( {
      val (s2, d2, _) = graft.operators.Dedup.nearDupSurfaces(pages, "url", "text")
      noop(d2); s2.unpersist()
    })
    spark.stop()
  }
}
