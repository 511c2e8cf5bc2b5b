#!/bin/bash
# Round-4 in-round scaling campaign (verdict item 1): both legs of every
# pair measured INSIDE this round, on the round-4 suite composition
# (core + model families — scalingSuite). Scan-scales-with-cores proxy:
# input cache OFF so every pass regenerates the deterministic input the
# way a real cluster's parquet scan scales with executor count.
#
# Protocol:
#  - fresh JVM per leg (SPARK_GRAFT_ONESHOT) with memory-proportional
#    heaps (an executor has fixed resources: 4N executors = 4x cores AND
#    4x aggregate memory);
#  - legs alternated 32/8, ATTEMPTS pairs;
#  - every leg gated on 1-min load < 2.0 (the round-3 T(32) legs were
#    poisoned by background tenancy; this is the judge-prescribed gate);
#  - best-of per configuration -> efficiency = T(8) / (4 * T(32)).
set -u
cd /root/repo
ATTEMPTS=${ATTEMPTS:-3}
PAGES=${PAGES:-100000000}
MAIN=/tmp/scaling_r4_main.log
rm -f /tmp/scaling_r4_*.log

wait_quiet() {
  for i in $(seq 1 240); do
    load=$(cut -d' ' -f1 /proc/loadavg)
    if python3 -c "import sys; sys.exit(0 if float('$load') < 2.0 else 1)"; then
      return 0
    fi
    echo "[campaign] $(date +%T) load=$load — waiting" >> "$MAIN"
    sleep 30
  done
  echo "[campaign] $(date +%T) load gate timed out, proceeding" >> "$MAIN"
}

leg() { # cores mem
  wait_quiet
  echo "[campaign] $(date +%T) leg cores=$1 heap=$2 load=$(cut -d' ' -f1-3 /proc/loadavg)" >> "$MAIN"
  SPARK_GRAFT_ONESHOT=$1 SPARK_DRIVER_MEM=$2 SPARK_GRAFT_PAGES=$PAGES \
    SPARK_GRAFT_CACHE=off \
    sbt -batch "runMain graft.ScalingBench" >> "/tmp/scaling_r4_$1.log" 2>&1
  echo "[campaign] $(date +%T) leg cores=$1 done" >> "$MAIN"
}

for rep in $(seq 1 "$ATTEMPTS"); do
  leg 32 96g
  leg 8 24g
done

# compute-isolated pass incl. the heavy signature op (verdict item 9):
# light keyscan op at 100M for cross-round comparability; the md5-per-
# token signature op at 10M in the same wall budget.
wait_quiet
SPARK_GRAFT_MODE=compute SPARK_GRAFT_OPS=keyscan_digit_panel \
  SPARK_GRAFT_PAGES=100000000 SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=24g \
  sbt -batch "runMain graft.ScalingBench" >> /tmp/scaling_r4_compute.log 2>&1
wait_quiet
SPARK_GRAFT_MODE=compute SPARK_GRAFT_OPS=dedup_signatures \
  SPARK_GRAFT_PAGES=10000000 SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=24g \
  sbt -batch "runMain graft.ScalingBench" >> /tmp/scaling_r4_compute.log 2>&1

echo DONE >> "$MAIN"
echo DONE
