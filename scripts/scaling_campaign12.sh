#!/bin/bash
# Round-5 campaign 12 — clean-host rerun of the two 120 M-page pairs.
#
# Why rerun: every campaign-8..11 leg started at 1-min load 1.4-2.0 (a
# resident ~9 GB orphaned ScalingBench JVM from a dead builder session
# was discovered and killed only after campaign 11), and the campaign-8
# legs predate two engine cuts that landed later the same day — the
# packed-long simhash combo key (explode pass 6.8 s -> 0.7 s at 2 M
# pages) and the un-panel slot-index chain collapse. The host has since
# rebooted: load is now < 0.1 with 123 GiB free. This campaign reruns
# the SAME two protocols (campaign 8: in-process 2->8->32 suite pair;
# campaign 11: 2-vs-8 REAL executor JVMs) over a freshly materialized
# 120 M-page table with the round-5-final binary, so the round's
# headline pair is measured on a quiet box with the shipped code.
#
# JVM regime identical to campaigns 7-11: pre-touched equal heaps, 2 g
# code cache, /dev/shm shuffle, fresh JVM per leg, load-gated,
# alternated reps (8 first), rc + loadavg recorded, setsid-detached.
set -u
MAIN=/tmp/scaling_r5h_main.log
CP="/tmp/graft_scaling_classes:/opt/spark/jars/*"
INPUT=/tmp/pages_120m
PAGES=120000000
JVM="-Xmx24g -Xms24g -XX:+AlwaysPreTouch -XX:ReservedCodeCacheSize=2g -Dspark.local.dir=/dev/shm/spark-tmp"
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

leg() { # cores tag  (in-process local[cores])
  wait_quiet
  mkdir -p /dev/shm/spark-tmp
  note "suite leg cores=$1 tag=$2 start load=$(cut -d' ' -f1-3 /proc/loadavg)"
  SPARK_GRAFT_ONESHOT=$1 SPARK_GRAFT_PAGES=$PAGES SPARK_GRAFT_CACHE=off \
    SPARK_GRAFT_INPUT=$INPUT SPARK_DRIVER_MEM=24g \
    java $JVM -cp "$CP" graft.ScalingBench >> "/tmp/scaling_r5h_$2.log" 2>&1
  note "suite leg cores=$1 tag=$2 done rc=$? end load=$(cut -d' ' -f1-3 /proc/loadavg)"
  rm -rf /dev/shm/spark-tmp
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
      -cp "$CP" graft.ScalingBench >> "/tmp/scaling_r5h_$3.log" 2>&1
  note "executor leg n=$1 done rc=$? end load=$(cut -d' ' -f1-3 /proc/loadavg)"
  rm -rf /dev/shm/spark-tmp
}

note "campaign12 start, snapshot $(ls -ld /tmp/graft_scaling_classes | awk '{print $6, $7, $8}')"

if [ ! -d "$INPUT" ]; then
  wait_quiet
  note "materialize $PAGES pages -> $INPUT start"
  SPARK_GRAFT_MODE=materialize SPARK_GRAFT_PAGES=$PAGES SPARK_GRAFT_OUT=$INPUT \
    SPARK_GRAFT_PARTS=256 SPARK_DRIVER_MEM=24g \
    java $JVM -cp "$CP" graft.ScalingBench >> /tmp/scaling_r5h_mat.log 2>&1
  note "materialize done rc=$? size=$(du -sh $INPUT | cut -f1)"
fi

# ---- phase 1: in-process suite pair (campaign-8 shape) ----
# REPS env parameterizes the pair count (round-5 ran 2 in-script; the
# recorded third rep pair was driven by re-invoking these legs — the
# ADVICE.md round-5 note; default now covers all recorded reps)
REPS="${REPS:-3}"
for rep in $(seq 1 "$REPS"); do
  leg 8 "8_r$rep"
  leg 2 "2_r$rep"
done
leg 32 "32_r1"

# ---- phase 2: 2-vs-8 REAL executor JVMs (campaign-11 shape) ----
for rep in $(seq 1 "$REPS"); do
  eleg 8 8 "e8_r$rep"
  eleg 2 2 "e2_r$rep"
done
note DONE
