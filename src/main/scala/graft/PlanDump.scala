package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool (round 6): dumps `.explain("formatted")` for named declared
  * queries to plans/r06/<name>_<suffix>.txt — the before/after plan
  * artifacts the optimization round commits alongside the code. Also
  * understands the pseudo-entries `near_dup_drops` / `near_dup_pairs`
  * (the NearDupCheck suite lineage, which is not itself a declared query
  * but is the dominant bench leg).
  *
  * Usage: runMain graft.PlanDump <suffix> <name> [<name> ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val names = args.drop(1).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get("plans/r06")
    Files.createDirectories(outDir)
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.write(outDir.resolve(s"${name}_$suffix.txt"), txt.getBytes("UTF-8"))
      println(s"[plandump] wrote ${name}_$suffix.txt")
    }
    SparkEntry.allSpecs.filter(s => names.contains(s.name)).foreach { spec =>
      dump(spec.name, spec.fn(spark, sfDir))
    }
    if (names.contains("near_dup_drops") || names.contains("near_dup_pairs")) {
      val pages = graft.sources.Pages.generate(spark, 20000, numPartitions = 8)
      val (sig, drops, _) = graft.operators.Dedup.nearDupSurfaces(pages, "url", "text")
      if (names.contains("near_dup_drops")) dump("near_dup_drops", drops)
      if (names.contains("near_dup_pairs")) {
        val (pairs, _) = graft.operators.Dedup.simhashPairsWithStats(
          sig.select(org.apache.spark.sql.functions.col("id"),
            org.apache.spark.sql.functions.col("sim")))
        dump("near_dup_pairs", pairs)
      }
      sig.unpersist()
    }
    spark.stop()
  }
}
