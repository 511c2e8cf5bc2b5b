package graft

import graft.checks.GroupVarianceCheck
import graft.operators.GroupVariance
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-6 phase attribution for the GroupVariance family at bench scale. */
object GvProbe {
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
      println(f"[gv] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val pages = graft.sources.Pages.generate(spark, nPages, numPartitions = cpus * 4)
    t("pages cache+count")(pages.cache().count())
    val check = GroupVarianceCheck("score_variance", "score", "host_bucket")
    graft.engine.CacheTracker.scope {
      val sr = t("scaledResiduals build (collects)")(
        GroupVariance.scaledResiduals(pages, check))
      t("scaledResiduals noop")(noop(sr.select(col("__key"), col("__grp"), col("rscaled"))))
      t("tests build+noop")( {
        val tt = GroupVariance.tests(pages, check)
        noop(tt)
      })
      t("verdict+violations from tests")( {
        val tt = GroupVariance.tests(pages, check)
        noop(GroupVariance.verdictsFrom(tt, check)
          .withColumn("kind", lit("v"))
          .unionByName(GroupVariance.violationsFrom(tt, check)
            .withColumn("kind", lit("x")), allowMissingColumns = true))
      })
    }
    spark.stop()
  }
}
