#!/bin/bash
# Round-4 campaign, right-sized after the first attempt showed the
# model-family suite is ~5x heavier than round 3 (T32 @100M = 2442 s,
# banked in /tmp/scaling_r4_32.log): a 3-pair ATTEMPTS loop at 100M
# would cost ~9 h. Instead:
#   1. ONE T8 leg at 100M      -> pairs with the banked in-round T32 leg
#   2. compute keyscan  @100M  -> light row-op pair (cross-round comparable)
#   3. compute dedup-sig @10M  -> compute-BOUND row-op pair (verdict item 9)
#   4. bonus second T32 @100M  -> firms up best-of (optional, last)
# Every leg load-gated at 1-min load < 2.0; fresh JVM per leg;
# memory-proportional heaps (24g @8 cores, 96g @32 cores).
set -u
cd /root/repo
PAGES=${PAGES:-100000000}
MAIN=/tmp/scaling_r4b_main.log

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
    sbt -batch "runMain graft.ScalingBench" >> "/tmp/scaling_r4b_$1.log" 2>&1
  echo "[campaign] $(date +%T) leg cores=$1 done" >> "$MAIN"
}

leg 8 24g

wait_quiet
echo "[campaign] $(date +%T) compute keyscan start" >> "$MAIN"
SPARK_GRAFT_MODE=compute SPARK_GRAFT_OPS=keyscan_digit_panel \
  SPARK_GRAFT_PAGES=100000000 SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=24g \
  sbt -batch "runMain graft.ScalingBench" >> /tmp/scaling_r4b_compute.log 2>&1
wait_quiet
echo "[campaign] $(date +%T) compute dedup_signatures start" >> "$MAIN"
SPARK_GRAFT_MODE=compute SPARK_GRAFT_OPS=dedup_signatures \
  SPARK_GRAFT_PAGES=10000000 SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=24g \
  sbt -batch "runMain graft.ScalingBench" >> /tmp/scaling_r4b_compute.log 2>&1

leg 32 96g

echo DONE >> "$MAIN"
echo DONE
