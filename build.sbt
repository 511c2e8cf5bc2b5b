ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sasstatisticaldatachecksspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Shuffle/spill scratch space: /tmp sits on the rootfs disk here while
  // /dev/shm is tmpfs — the shuffle-heavy legs (near-dup pair generation)
  // pay real disk I/O for scratch bytes a production node would put on
  // fast local NVMe. Parameterised (SPARK_GRAFT_LOCAL_DIR) with the tmpfs
  // default; the scaling campaigns (scripts/scaling_campaign*.sh) have
  // always run with this setting, so it also aligns the driver bench with
  // the recorded scaling evidence. Spark creates the directory on startup.
  s"-Dspark.local.dir=${sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-tmp")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // The default 240 MB JIT code cache FILLS under a multi-query Spark
  // session (one whole-stage-codegen class per stage × ~200 stages in
  // Bench): the compiler is then silently disabled and later queries run
  // INTERPRETED — measured 2.2× suite inflation and "warm slower than
  // cold" inversions before this was found (BENCH/BASELINE.md round 5).
  // The reservation is virtual address space, not committed memory.
  "-XX:ReservedCodeCacheSize=2g",
  // Commit + pre-fault the heap up front: lazy first-touch page faulting
  // of a large heap otherwise serializes inside the kernel mid-benchmark
  // (measured 2.3× on a 96 GB heap leg — same baseline doc).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
  // Throughput collector for the batch-shaped forked runs: alternated A/B
  // pairs (round 6) read 107.3/108.7 s total vs 111.7/112.1 s under the
  // JDK-17 default G1 on the driver-shaped bench — the win sits in the
  // allocation-heavy per-query section; pause latency is irrelevant here.
  // Appending e.g. "-XX:+UseG1GC" via SPARK_GRAFT_JVM_EXTRA overrides it
  // (the JVM honors the last GC flag).
  "-XX:+UseParallelGC",
  // Spark's generated-code cache (static conf) holds only 100 compiled
  // fragments by default; a session that runs many distinct plans — the
  // 74-query bench plus six suite compositions here, or any long-lived
  // multi-query production session — evicts and RE-JANINO-COMPILES
  // fragments whose source is byte-identical (measured: isolated re-runs
  // of a query read 0.9 s under the default vs 0.2 s with the cache
  // sized to hold the session's fragments; alternated full-bench A/B
  // pairs read 122.4/121.1/124.7 s total vs 109.9/109.6/113.0 s, with
  // every suite family leg 30-40% faster because the single-family runs
  // re-execute plans the full suite already compiled). 8192 entries is
  // headroom, not tuning: entries are compiled classes already counted
  // by ReservedCodeCacheSize. Static conf, so it must be set before
  // session creation — hence a JVM system property, not a builder call.
  "-Dspark.sql.codegen.cache.maxEntries=8192",
) ++ sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
