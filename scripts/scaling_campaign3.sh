#!/bin/bash
# Full-suite scaling with the scan-scales-with-cores proxy: input cache
# OFF, so every pass regenerates the deterministic input (pure CPU) the
# way a real cluster's parquet scan scales with executor count. Same-JVM
# alternated reps, best-of per config (heap is irrelevant uncached).
set -x
cd /root/repo

SPARK_GRAFT_CACHE=off SPARK_GRAFT_PAGES=100000000 SPARK_GRAFT_REPS=2 \
  SPARK_DRIVER_MEM=24g \
  sbt -batch "runMain graft.ScalingBench" \
  > /tmp/scaling_nocache100.log 2>&1

SPARK_GRAFT_CACHE=off SPARK_GRAFT_PAGES=20000000 SPARK_GRAFT_REPS=3 \
  SPARK_DRIVER_MEM=24g \
  sbt -batch "runMain graft.ScalingBench" \
  > /tmp/scaling_nocache20.log 2>&1

echo DONE
