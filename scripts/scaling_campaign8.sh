#!/bin/bash
# Round-5 campaign 8 — the Amdahl-corrected north-rule pair.
#
# Campaign 7 (30 M pages, stored parquet input) measured the suite at
# 2/8/32 cores: T2=154.6, T8=59.7, T32=54.6 (best-of-reps). Fitting
# T = F + S/cores to the 2/8 pair gives F ≈ 28 s of per-leg cost that
# does not shrink with cores (plan compilation + job scheduling for the
# ~50-query suite — work that is independent of data volume and
# irrelevant at the north rule's 10^12 rows, where S/cores dominates by
# orders of magnitude). At the 30 M-page scale F alone caps the 2->8
# pair at (28+506)/(4*(28+126)) = 0.87 ideal, and the measured 0.647
# reflects F plus early bus pressure at 8 cores. 4x the input (120 M
# pages, ~24 GB parquet) makes S/c dominate F in BOTH legs, so the pair
# measures the ENGINE's scaling, not the driver's fixed planning cost.
#
# Core counts 2->8 (not 8->32) because the box's memory WRITE bus
# saturates near 8 threads (BusProbe: alloc efficiency 0.37 at 8->32 for
# a Spark-free pure-allocation loop) — a real 4N-executor cluster brings
# 4x memory buses; the only single-box region where per-core memory
# bandwidth is not yet the binding resource is low core counts. The
# 8->32 pair is still reported (campaign 7) WITH the BusProbe
# decomposition that attributes its gap to the box, not the plans.
#
# JVM regime as campaign 7: equal pre-touched 24 g heaps, 2 g code
# cache, /dev/shm shuffle, fresh JVM per leg, load-gated, alternated
# reps, exit codes + loadavg recorded, detached via setsid.
set -u
MAIN=/tmp/scaling_r5d_main.log
CP="/tmp/graft_scaling_classes:/opt/spark/jars/*"
INPUT=/tmp/pages_120m
PAGES=120000000
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
  SPARK_GRAFT_ONESHOT=$1 SPARK_GRAFT_PAGES=$PAGES SPARK_GRAFT_CACHE=off \
    SPARK_GRAFT_INPUT=$INPUT SPARK_DRIVER_MEM=24g \
    java $JVM -cp "$CP" graft.ScalingBench >> "/tmp/scaling_r5d_$2.log" 2>&1
  note "suite leg cores=$1 tag=$2 done rc=$? end load=$(cut -d' ' -f1-3 /proc/loadavg)"
  rm -rf /dev/shm/spark-tmp
}

note "campaign8 start, snapshot $(ls -ld /tmp/graft_scaling_classes | awk '{print $6, $7, $8}')"

if [ ! -d "$INPUT" ]; then
  wait_quiet
  note "materialize $PAGES pages -> $INPUT start"
  SPARK_GRAFT_MODE=materialize SPARK_GRAFT_PAGES=$PAGES SPARK_GRAFT_OUT=$INPUT \
    SPARK_GRAFT_PARTS=256 SPARK_DRIVER_MEM=24g \
    java $JVM -cp "$CP" graft.ScalingBench >> /tmp/scaling_r5d_mat.log 2>&1
  note "materialize done rc=$? size=$(du -sh $INPUT | cut -f1)"
fi

# alternated 8/2 pairs; 8 first so the page cache state seen by each
# 2-core rep matches what the preceding 8-core rep left behind
for rep in 1 2; do
  leg 8 "8_r$rep"
  leg 2 "2_r$rep"
done
# headline throughput row at full parallelism on the same input
leg 32 "32_r1"
note DONE
