#!/bin/bash
# North-rule scaling campaign: compute-only + full-suite pairs at
# local[8] vs local[32] on the same input (sandbox proxy for N vs 4N
# executors). Writes per-phase logs to /tmp/scaling_*.log; the JSON
# result lines are the last lines of each log.
#
# Heap: `run / fork := true`, so the JVM heap is set by SPARK_DRIVER_MEM
# (plumbed through javaOptions in build.sbt) — NOT by sbt -mem.
set -x
cd /root/repo

# Phase 1: compute-only row pass (isolates CPU scaling from the
# shared-disk/memory-bus shuffle the single box cannot scale); the
# codegen pass is ~1 µs/row so 100M rows gives a measurable W
SPARK_GRAFT_MODE=compute SPARK_GRAFT_PAGES=100000000 SPARK_GRAFT_REPS=3 \
  SPARK_DRIVER_MEM=24g \
  sbt -batch "runMain graft.ScalingBench" \
  > /tmp/scaling_compute.log 2>&1

# Phase 2: full validation suite at 20M pages
SPARK_GRAFT_PAGES=20000000 SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=64g \
  sbt -batch "runMain graft.ScalingBench" \
  > /tmp/scaling_suite20.log 2>&1

# Phase 3: full validation suite at 100M pages (amortizes fixed cost)
SPARK_GRAFT_PAGES=100000000 SPARK_GRAFT_REPS=2 SPARK_DRIVER_MEM=96g \
  sbt -batch "runMain graft.ScalingBench" \
  > /tmp/scaling_suite100.log 2>&1

echo DONE
