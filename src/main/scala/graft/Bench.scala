package graft

import graft.engine.Runner
import graft.queries.Flagship
import graft.sources.Pages
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR plus the full validation suite over a synthetic
  * pages table, and prints ONE JSON line.
  *
  * Environment knobs:
  *   SPARK_GRAFT_SF_DIR — parquet dir (default sf0.1)
  *   SPARK_GRAFT_CPUS   — local[N] cores (default 32); the north-rule
  *                        scaling evidence runs this twice (8 vs 32) on
  *                        the SAME input — see BENCH/BASELINE.md
  *   SPARK_GRAFT_PAGES  — synthetic pages row count (default 2,000,000)
  */
object Bench {
  /** Locale-stable numeric rendering — the driver json.loads the line, and
    * a comma-decimal JVM locale would corrupt it. */
  private def num(v: Double, digits: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${digits}f", Double.box(v))

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** 1-minute load average — stamped into the JSON at start and end so a
    * contended-host run self-documents (the round-4 bench was taken under
    * background tenancy and read 1.3–6.6× inflated; cross-referencing
    * load traces was the only way to tell). −1 if unreadable. */
  private def loadavg1: Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** OS page-cache size (MB) — a cold/warm hint for the sf parquet scans:
    * a near-zero cache after another tenant churned memory means the early
    * queries pay disk reads a warm host would not. −1 if unreadable. */
  private def pageCacheMb: Long =
    try scala.io.Source.fromFile("/proc/meminfo").getLines()
      .collectFirst { case l if l.startsWith("Cached:") =>
        l.split("\\s+")(1).toLong / 1024 }.getOrElse(-1L)
    catch { case _: Throwable => -1L }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nPages = sys.env.getOrElse("SPARK_GRAFT_PAGES", "2000000").toLong
    val loadStart = loadavg1
    val cacheMbStart = pageCacheMb
    // NOTE: driver heap cannot be set from inside an already-running JVM —
    // size it at launch (sbt -mem / SBT_OPTS / .jvmopts), see BENCH/BASELINE.md
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    // a crashing query must surface as an error, not a flattering fast
    // timing (round-1 fix): per-query error strings ride the JSON line
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()

    // untimed warmup: the JVM's first Spark action pays one-off JIT +
    // codegen-compiler cost (~5 s) that otherwise lands entirely on the
    // first timed query (round-1 bench showed q01 at 6.4 s vs a ~1 s warm
    // plan); run the first query once untimed so every timed number below
    // is steady-state
    SparkEntry.allSpecs.headOption.foreach { spec =>
      try spec.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    SparkEntry.allSpecs.foreach { spec =>
      results(spec.name) = time {
        try spec.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch {
          case e: Throwable =>
            errors(spec.name) = jsonEscape(
              s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(160)}")
        }
      }
    }

    // full validation suite over the synthetic web-pages table: the
    // north-rule workload; docs/sec is the headline throughput. Generation
    // is timed separately — it stands in for the parquet scan a real table
    // would provide and is not engine work.
    val pages = Pages.generate(spark, nPages, numPartitions = cpus.toInt * 4)
    results("pages_generate") = time(pages.cache().count())
    // scope releases each run's operator caches once the output is
    // materialized — the long-lived-session hygiene the resumable path
    // gets per unit. Verdicts + violations ride ONE action (union with a
    // kind column) so the ~50 reduced-frame stages schedule once.
    // Two compositions are timed: the round-3-comparable core suite
    // (cross-round throughput continuity) and the FULL suite (core +
    // model families + near-dup) — the headline docs/sec is the full one.
    results("validation_suite_core") = time {
      graft.engine.CacheTracker.scope {
        Runner.run(pages, Flagship.coreSuite(spark))
          .unified.write.format("noop").mode("overwrite").save()
      }
    }
    val suiteSec = time {
      graft.engine.CacheTracker.scope {
        Runner.run(pages, Flagship.suite(spark))
          .unified.write.format("noop").mode("overwrite").save()
      }
    }
    results("validation_suite_pages") = suiteSec
    val docsPerSec = nPages / suiteSec

    // per-family breakdown over the SAME cached input: each model family
    // and the near-dup check timed as its own suite run, so "the model
    // families are ~7× the core" is a tracked number and a regression in
    // one family localizes instead of hiding inside the full-suite total.
    // (The full suite fuses shared passes, so these single-family runs sum
    // to MORE than validation_suite_pages — they measure families, not
    // partitions of the total.)
    val breakdown = scala.collection.mutable.LinkedHashMap[String, Double]()
    breakdown("core") = results("validation_suite_core")
    val familyRuns: Seq[(String, Seq[graft.checks.Check])] =
      Flagship.modelChecks.map(c => c.id -> Seq(c)) ++
        Seq("near_dup" -> Flagship.dedupChecks)
    familyRuns.foreach { case (name, cs) =>
      breakdown(name) = time {
        graft.engine.CacheTracker.scope {
          Runner.run(pages, Flagship.suiteOf(spark, cs))
            .unified.write.format("noop").mode("overwrite").save()
        }
      }
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + num(v, 3) }
      .mkString("{", ",", "}")
    val bd = breakdown.map { case (k, v) => "\"" + k + "\":" + num(v, 3) }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results.values.sum
    println(s"""{"metric":"validation throughput (docs/sec), full suite over """ +
      s"""$nPages synthetic pages at local[$cpus], value=end-to-end seconds all queries+suite",""" +
      s""""value":${num(total, 3)},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir",""" +
      s""""cpus":$cpus,"pages":$nPages,"suite_sec":${num(suiteSec, 3)},""" +
      s""""docs_per_sec":${num(docsPerSec, 1)},"suite_breakdown":$bd,""" +
      s""""load_1m_start":${num(loadStart, 2)},"load_1m_end":${num(loadavg1, 2)},""" +
      s""""page_cache_mb_start":$cacheMbStart,"page_cache_mb_end":$pageCacheMb}""")
    spark.stop()
  }
}
