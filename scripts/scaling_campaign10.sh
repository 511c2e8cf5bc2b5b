#!/bin/bash
# Round-5 campaign 10 — the north rule's LITERAL shape: N vs 4N EXECUTORS.
#
# Spark's local-cluster[n, cores, memMB] master launches n real separate
# executor JVMs (own heaps, netty shuffle service, serialized exchanges)
# on this box — the closest a single machine gets to "run at two cluster
# sizes". Legs: 2 vs 8 single-core executors over the SAME stored
# 30 M-page table, cache off (every pass re-scans parquet, as a cluster
# would), 4 GiB per executor — so the 4N config has 4x the cores AND 4x
# the aggregate executor memory, matching the north-rule cluster scaling.
#
# Shared-box caveat stays: all executor JVMs sit on ONE memory bus
# (BusProbe ceilings in BENCH/BASELINE.md apply as before); what this
# adds over the thread-mode pairs is the full multi-executor execution
# stack — process isolation, executor-to-executor shuffle over netty,
# serialization — in the measured path.
#
# JVM regime per the round-5 findings: pre-touched heaps + big code cache
# on BOTH driver and executors, /dev/shm shuffle, fresh JVM per leg,
# load-gated, alternated reps, rc + loadavg recorded, detached via setsid.
set -u
MAIN=/tmp/scaling_r5f_main.log
CP="/tmp/graft_scaling_classes:/opt/spark/jars/*"
DRIVER_JVM="-Xmx8g -Xms8g -XX:+AlwaysPreTouch -XX:ReservedCodeCacheSize=2g -Dspark.local.dir=/dev/shm/spark-tmp"
EXEC_OPTS="-XX:+AlwaysPreTouch -XX:ReservedCodeCacheSize=1g"

note() { echo "[campaign] $(date +%T) $*" >> "$MAIN"; }

wait_quiet() {
  for i in $(seq 1 60); do
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
  # SPARK_GRAFT_EXEC_MEM sets spark.executor.memory (campaign-10 post-
  # mortem: leaving it at the 1g default while extraJavaOptions forces
  # -Xms4096m kills every executor at VM init and the master relaunches
  # forever). SPARK_LOCAL_DIRS reaches the executor JVMs (they ignore
  # the driver's spark.local.dir in standalone mode).
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
    SPARK_LOCAL_DIRS=/dev/shm/spark-tmp \
    SPARK_GRAFT_MASTER="local-cluster[$1,1,4096]" \
    SPARK_GRAFT_EXEC_CP=/tmp/graft_scaling_classes \
    SPARK_GRAFT_EXEC_MEM=4g \
    SPARK_GRAFT_ONESHOT="$2" SPARK_GRAFT_PAGES=30000000 \
    SPARK_GRAFT_INPUT=/tmp/pages_30m SPARK_GRAFT_CACHE=off \
    SPARK_DRIVER_MEM=8g \
    java $DRIVER_JVM \
      "-Dspark.executor.extraJavaOptions=-Xms4096m $EXEC_OPTS" \
      -cp "$CP" graft.ScalingBench >> "/tmp/scaling_r5f_$3.log" 2>&1
  note "executor leg n=$1 done rc=$? end load=$(cut -d' ' -f1-3 /proc/loadavg)"
  rm -rf /dev/shm/spark-tmp
}

note "campaign10 start, snapshot $(ls -ld /tmp/graft_scaling_classes | awk '{print $6, $7, $8}')"

if [ ! -d /tmp/pages_30m ]; then
  wait_quiet
  note "materialize 30M pages -> /tmp/pages_30m start"
  SPARK_GRAFT_MODE=materialize SPARK_GRAFT_PAGES=30000000 \
    SPARK_GRAFT_OUT=/tmp/pages_30m SPARK_GRAFT_PARTS=128 SPARK_DRIVER_MEM=24g \
    java -Xmx24g -Xms24g -XX:+AlwaysPreTouch -XX:ReservedCodeCacheSize=2g \
      -Dspark.local.dir=/dev/shm/spark-tmp \
      -cp "$CP" graft.ScalingBench >> /tmp/scaling_r5f_mat.log 2>&1
  note "materialize done rc=$? size=$(du -sh /tmp/pages_30m | cut -f1)"
fi

# alternated reps, 8-executor leg first so rep pairs see similar cache state
leg 8 8 e8_r1
leg 2 2 e2_r1
leg 8 8 e8_r2
leg 2 2 e2_r2
note DONE
