#!/bin/bash
# North-rule scaling campaign: compute-only + full-suite pairs at
# local[8] vs local[32] on the same input (sandbox proxy for N vs 4N
# executors). Writes per-phase logs to /tmp/scaling_*.log; the JSON
# result lines are the last lines of each log.
set -x
cd /root/repo

# Phase 1: compute-only row pass (isolates CPU scaling from the
# shared-disk/memory-bus shuffle the single box cannot scale)
SPARK_GRAFT_MODE=compute SPARK_GRAFT_PAGES=8000000 SPARK_GRAFT_REPS=3 \
  sbt -batch -mem 49152 "runMain graft.ScalingBench" \
  > /tmp/scaling_compute.log 2>&1

# Phase 2: full validation suite at 20M pages
SPARK_GRAFT_PAGES=20000000 SPARK_GRAFT_REPS=3 \
  sbt -batch -mem 65536 "runMain graft.ScalingBench" \
  > /tmp/scaling_suite20.log 2>&1

# Phase 3: full validation suite at 100M pages (amortizes fixed cost)
SPARK_GRAFT_PAGES=100000000 SPARK_GRAFT_REPS=2 \
  sbt -batch -mem 98304 "runMain graft.ScalingBench" \
  > /tmp/scaling_suite100.log 2>&1

echo DONE
