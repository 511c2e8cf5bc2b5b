#!/bin/bash
# Round-5 campaign 11 — the executor-count pair at COMPUTE-DOMINATED size.
#
# Campaign 10 measured the 2-vs-8-executor pair at 30 M pages and found
# it fixed-cost-dominated: the local-cluster harness (driver RPC + task
# dispatch for ~140 stages, torrent broadcast to every executor JVM,
# netty exchange setup) costs a constant ~113 s per run — 59-85% of the
# 30 M legs' wall. This campaign re-runs the SAME protocol over the
# stored 120 M-page table (24 GB parquet), where the data-proportional
# work is ~4x and the harness constant amortizes, mirroring exactly the
# 30 M -> 120 M move that took the in-process pair 0.622 -> 0.765.
#
# Same regime as campaign 10: 2 vs 8 single-core 4 GiB executor JVMs
# (4N config = 4x cores AND 4x aggregate executor memory), cache off
# (every pass re-scans parquet), pre-touched heaps + big code cache on
# driver and executors, /dev/shm shuffle for all JVMs, fresh JVM per
# leg, load-gated, alternated reps, rc + loadavg recorded, setsid.
set -u
MAIN=/tmp/scaling_r5g_main.log
CP="/tmp/graft_scaling_classes:/opt/spark/jars/*"
DRIVER_JVM="-Xmx8g -Xms8g -XX:+AlwaysPreTouch -XX:ReservedCodeCacheSize=2g -Dspark.local.dir=/dev/shm/spark-tmp"
EXEC_OPTS="-XX:+AlwaysPreTouch -XX:ReservedCodeCacheSize=1g"

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

leg() { # n_executors total_cores tag
  wait_quiet
  mkdir -p /dev/shm/spark-tmp
  note "executor leg n=$1 cores=$2 tag=$3 start load=$(cut -d' ' -f1-3 /proc/loadavg)"
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
    SPARK_LOCAL_DIRS=/dev/shm/spark-tmp \
    SPARK_GRAFT_MASTER="local-cluster[$1,1,4096]" \
    SPARK_GRAFT_EXEC_CP=/tmp/graft_scaling_classes \
    SPARK_GRAFT_EXEC_MEM=4g \
    SPARK_GRAFT_ONESHOT="$2" SPARK_GRAFT_PAGES=120000000 \
    SPARK_GRAFT_INPUT=/tmp/pages_120m SPARK_GRAFT_CACHE=off \
    SPARK_DRIVER_MEM=8g \
    java $DRIVER_JVM \
      "-Dspark.executor.extraJavaOptions=-Xms4096m $EXEC_OPTS" \
      -cp "$CP" graft.ScalingBench >> "/tmp/scaling_r5g_$3.log" 2>&1
  note "executor leg n=$1 done rc=$? end load=$(cut -d' ' -f1-3 /proc/loadavg)"
  rm -rf /dev/shm/spark-tmp
}

note "campaign11 start, snapshot $(ls -ld /tmp/graft_scaling_classes | awk '{print $6, $7, $8}')"

# alternated reps, 8-executor leg first so rep pairs see similar cache state
leg 8 8 e8_120_r1
leg 2 2 e2_120_r1
leg 8 8 e8_120_r2
leg 2 2 e2_120_r2
note DONE
