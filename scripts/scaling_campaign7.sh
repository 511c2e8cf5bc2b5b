#!/bin/bash
# Round-5 FINAL campaign — suite + compute scaling pairs over the
# MATERIALIZED 30M-page parquet table (/tmp/pages_30m), per the round-5
# finding that in-line input synthesis saturates the box's memory write
# bus below 8 threads and measures the generator, not the engine.
#
# JVM regime (every leg): -Xms=-Xmx pre-touched (lazy heap commit
# page-faults mid-run: measured 2.3x on a 96g leg), 2g reserved code
# cache (240 MB default fills -> compiler disabled: measured 2.2x),
# shuffle on /dev/shm (the one shared disk otherwise serializes shuffle
# I/O). Equal 24g heaps for every core count: a per-core-proportional
# heap gave the high-core leg no benefit and the low-core leg none
# either (suite working sets are far below 24g), while UNEQUAL heaps
# made legs incomparable.
#
# Alternated reps, fresh JVM per leg, load-gated, exit codes + loadavg
# recorded. Detached via setsid so a dying driver session cannot kill it.
set -u
MAIN=/tmp/scaling_r5c_main.log
CP="/tmp/graft_scaling_classes:/opt/spark/jars/*"
INPUT=/tmp/pages_30m
JVM="-Xmx24g -Xms24g -XX:+AlwaysPreTouch -XX:ReservedCodeCacheSize=2g -Dspark.local.dir=/dev/shm/spark-tmp"

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

leg() { # cores tag
  wait_quiet
  mkdir -p /dev/shm/spark-tmp
  note "suite leg cores=$1 tag=$2 start load=$(cut -d' ' -f1-3 /proc/loadavg)"
  SPARK_GRAFT_ONESHOT=$1 SPARK_GRAFT_PAGES=30000000 SPARK_GRAFT_CACHE=off \
    SPARK_GRAFT_INPUT=$INPUT SPARK_DRIVER_MEM=24g \
    java $JVM -cp "$CP" graft.ScalingBench >> "/tmp/scaling_r5c_$2.log" 2>&1
  note "suite leg cores=$1 tag=$2 done rc=$? end load=$(cut -d' ' -f1-3 /proc/loadavg)"
  rm -rf /dev/shm/spark-tmp
}

compute() { # ops reps tag
  wait_quiet
  mkdir -p /dev/shm/spark-tmp
  note "compute $1 start load=$(cut -d' ' -f1-3 /proc/loadavg)"
  SPARK_GRAFT_MODE=compute SPARK_GRAFT_OPS="$1" SPARK_GRAFT_PAGES=30000000 \
    SPARK_GRAFT_REPS="$2" SPARK_GRAFT_INPUT=$INPUT SPARK_DRIVER_MEM=24g \
    java $JVM -cp "$CP" graft.ScalingBench >> "/tmp/scaling_r5c_$3.log" 2>&1
  note "compute $1 done rc=$? end load=$(cut -d' ' -f1-3 /proc/loadavg)"
  rm -rf /dev/shm/spark-tmp
}

note "campaign start, snapshot $(ls -ld /tmp/graft_scaling_classes | awk '{print $6, $7, $8}')"
# primary pair: 3 alternated reps of 32/8
for rep in 1 2 3; do
  leg 32 "32_r$rep"
  leg 8  "8_r$rep"
done
# secondary pair BELOW the bus knee: 2 alternated reps of 8/2
for rep in 1 2; do
  leg 8 "8b_r$rep"
  leg 2 "2_r$rep"
done
# compute-isolated CPU pairs over the same stored table
compute keyscan_digit_panel 3 ck
compute dedup_signatures 3 cd
note DONE
