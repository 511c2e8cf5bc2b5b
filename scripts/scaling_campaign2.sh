#!/bin/bash
# Memory-proportional scaling pairs (the fair N vs 4N executor proxy):
# an executor has fixed resources, so the 4N-executor cluster has 4x
# cores AND 4x aggregate memory. Each config runs in a FRESH JVM via
# SPARK_GRAFT_ONESHOT (heap is a launch-time setting), alternated reps.
set -x
cd /root/repo

run() { # cores mem pages tag
  SPARK_GRAFT_ONESHOT=$1 SPARK_DRIVER_MEM=$2 SPARK_GRAFT_PAGES=$3 \
    sbt -batch "runMain graft.ScalingBench" \
    >> /tmp/scaling_oneshot_$4.log 2>&1
}

rm -f /tmp/scaling_oneshot_*.log

# 100M pages: N=(8 cores, 24g) vs 4N=(32 cores, 96g), 2 alternated reps
for rep in 1 2; do
  run 8  24g 100000000 100m
  run 32 96g 100000000 100m
done

# 20M pages: N=(8, 16g) vs 4N=(32, 64g), 2 alternated reps
for rep in 1 2; do
  run 8  16g 20000000 20m
  run 32 64g 20000000 20m
done

echo DONE
