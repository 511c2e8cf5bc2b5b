package graft

import org.apache.spark.sql.SparkSession

/** Dev: dissect a single declared query's per-run constant — same frame
  * noop-written repeatedly (plan reuse), fresh frame per rep (plan rebuild),
  * and codegen on/off — to attribute time between planning, codegen and
  * actual evaluation. Usage: runMain graft.QProbe <name> */
object QProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spec = SparkEntry.allSpecs.find(_.name == name).get
    def t(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    // warmup JVM with an unrelated cheap action
    spark.range(1000).count()
    val df = spec.fn(spark, sfDir)
    println(f"[qp] fresh-frame first run : ${t(df.write.format("noop").mode("overwrite").save())}%6.3f")
    println(f"[qp] SAME frame second run: ${t(df.write.format("noop").mode("overwrite").save())}%6.3f")
    println(f"[qp] SAME frame third run : ${t(df.write.format("noop").mode("overwrite").save())}%6.3f")
    val df2 = spec.fn(spark, sfDir)
    println(f"[qp] fresh frame run      : ${t(df2.write.format("noop").mode("overwrite").save())}%6.3f")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val df3 = spec.fn(spark, sfDir)
    println(f"[qp] fresh, wscg OFF      : ${t(df3.write.format("noop").mode("overwrite").save())}%6.3f")
    val df4 = spec.fn(spark, sfDir)
    println(f"[qp] fresh, wscg OFF again: ${t(df4.write.format("noop").mode("overwrite").save())}%6.3f")
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val df5 = spec.fn(spark, sfDir)
    println(f"[qp] fresh, expr interp   : ${t(df5.write.format("noop").mode("overwrite").save())}%6.3f")
    spark.stop()
  }
}
