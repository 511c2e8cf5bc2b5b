#!/bin/bash
# Round-6 campaign 13 — the VERDICT-item-8 rerun: the 2-vs-8 REAL
# executor-JVM pair over the 120 M-page stored table, with the round-6
# engine (parallel per-check build, codegen cache sized to the session,
# native signature/scorer expressions). Round 5's best executor pair
# read raw 0.771 / plan-level 0.878 with a ~31 s fixed serial cost; the
# round-6 changes cut exactly that fixed cost, so this campaign re-runs
# the SAME protocol (campaign-12 phase 2) for a best-of-3 raw reading.
#
# JVM regime identical to campaigns 7-12 plus the round-6 codegen-cache
# default (build.sbt javaOptions do not apply to plain `java` runs, so
# every flag is spelled out here): pre-touched equal heaps, 2 g code
# cache, /dev/shm shuffle, 8192-entry codegen cache, fresh JVM per leg,
# load-gated, alternated reps (8 first), rc + loadavg recorded.
set -u
MAIN=/tmp/scaling_r6_main.log
CP="/tmp/graft_scaling_classes:/opt/spark/jars/*"
INPUT=/tmp/pages_120m
PAGES=120000000
COMMON="-XX:+AlwaysPreTouch -XX:ReservedCodeCacheSize=2g -Dspark.local.dir=/dev/shm/spark-tmp -Dspark.sql.codegen.cache.maxEntries=8192 -XX:+UseParallelGC"
JVM="-Xmx24g -Xms24g $COMMON"
DRIVER_JVM="-Xmx8g -Xms8g $COMMON"
# NOTE: no -Dspark.* flags here — Spark REJECTS spark options inside
# spark.executor.extraJavaOptions; the codegen-cache conf is set on the
# driver (system property → SparkConf) and propagates to executors.
EXEC_OPTS="-XX:+AlwaysPreTouch -XX:ReservedCodeCacheSize=1g -XX:+UseParallelGC"

note() { echo "[campaign] $(date +%T) $*" >> "$MAIN"; }

wait_quiet() {
  for i in $(seq 1 90); do
    load=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if float('$load') < 2.0 else 0)")
    [ "$ok" = 1 ] && return 0
    sleep 20
  done
  note "load gate timeout, proceeding load=$(cut -d' ' -f1 /proc/loadavg)"
}

eleg() { # n_executors total_cores tag  (local-cluster, 1 core 4 GiB each)
  wait_quiet
  mkdir -p /dev/shm/spark-tmp
  note "executor leg n=$1 cores=$2 tag=$3 start load=$(cut -d' ' -f1-3 /proc/loadavg)"
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
    SPARK_LOCAL_DIRS=/dev/shm/spark-tmp \
    SPARK_GRAFT_MASTER="local-cluster[$1,1,4096]" \
    SPARK_GRAFT_EXEC_CP=/tmp/graft_scaling_classes \
    SPARK_GRAFT_EXEC_MEM=4g \
    SPARK_GRAFT_ONESHOT="$2" SPARK_GRAFT_PAGES=$PAGES \
    SPARK_GRAFT_INPUT=$INPUT SPARK_GRAFT_CACHE=off \
    SPARK_DRIVER_MEM=8g \
    java $DRIVER_JVM \
      "-Dspark.executor.extraJavaOptions=-Xms4096m $EXEC_OPTS" \
      -cp "$CP" graft.ScalingBench >> "/tmp/scaling_r6_$3.log" 2>&1
  note "executor leg n=$1 done rc=$? end load=$(cut -d' ' -f1-3 /proc/loadavg)"
  rm -rf /dev/shm/spark-tmp
}

note "campaign13 start, snapshot $(ls -ld /tmp/graft_scaling_classes | awk '{print $6, $7, $8}')"

if [ ! -d "$INPUT" ]; then
  wait_quiet
  note "materialize $PAGES pages -> $INPUT start"
  SPARK_GRAFT_MODE=materialize SPARK_GRAFT_PAGES=$PAGES SPARK_GRAFT_OUT=$INPUT \
    SPARK_GRAFT_PARTS=256 SPARK_DRIVER_MEM=24g \
    java $JVM -cp "$CP" graft.ScalingBench >> /tmp/scaling_r6_mat.log 2>&1
  note "materialize done rc=$? size=$(du -sh $INPUT | cut -f1)"
fi

# 2-vs-8 REAL executor JVMs, best-of-3, alternated (8 first)
REPS="${REPS:-3}"
for rep in $(seq 1 "$REPS"); do
  eleg 8 8 "e8_r$rep"
  eleg 2 2 "e2_r$rep"
done
note DONE
