#!/bin/bash
# Round-5 campaign. Post-mortem of round 4 (/tmp/scaling_r4b_8.log): the
# 8-core leg was NOT OOM-killed (no dmesg OOM, 122 GiB free) — it was
# terminated when the round's wall clock ran out: at the model-family suite
# weight a 100 M-page 8-core leg needs >= 2.2 h and the campaign started too
# late. Mitigations here:
#   * 30 M pages for BOTH legs (the ratio, not the absolute, is the
#     north-rule deliverable): T32 ~ 12 min, T8 ~ 40-50 min per leg;
#   * campaign launched at the START of the round;
#   * legs run via plain `java -cp` against a FROZEN class snapshot
#     (/tmp/graft_scaling_classes) so sbt stays free and later commits
#     cannot change the measured binary mid-campaign;
#   * every leg records its exit code + start/end loadavg (a killed leg is
#     recorded, not silently absent).
# Order: primary 32/8 pair first, then the two compute-isolated pairs the
# round-4 campaign never reached, then a bonus pair (killable).
set -u
PAGES=${PAGES:-30000000}
MAIN=/tmp/scaling_r5_main.log
CP="/tmp/graft_scaling_classes:/opt/spark/jars/*"

note() { echo "[campaign] $(date +%T) $*" >> "$MAIN"; }

wait_quiet() {
  for i in $(seq 1 120); do
    load=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if float('$load') < 2.0 else 0)")
    [ "$ok" = 1 ] && return 0
    note "load=$load waiting"
    sleep 30
  done
  note "load gate timeout, proceeding"
}

leg() { # cores heap tag
  wait_quiet
  note "leg cores=$1 heap=$2 pages=$PAGES start load=$(cut -d' ' -f1-3 /proc/loadavg)"
  SPARK_GRAFT_ONESHOT=$1 SPARK_DRIVER_MEM=$2 SPARK_GRAFT_PAGES=$PAGES \
    SPARK_GRAFT_CACHE=off \
    java "-Xmx$2" -cp "$CP" graft.ScalingBench >> "/tmp/scaling_r5_$3.log" 2>&1
  note "leg cores=$1 tag=$3 done rc=$? end load=$(cut -d' ' -f1-3 /proc/loadavg)"
}

compute() { # ops pages reps tag
  wait_quiet
  note "compute $1 @$2 reps=$3 start load=$(cut -d' ' -f1-3 /proc/loadavg)"
  SPARK_GRAFT_MODE=compute SPARK_GRAFT_OPS="$1" SPARK_GRAFT_PAGES="$2" \
    SPARK_GRAFT_REPS="$3" SPARK_DRIVER_MEM=24g \
    java -Xmx24g -cp "$CP" graft.ScalingBench >> "/tmp/scaling_r5_$4.log" 2>&1
  note "compute $1 done rc=$? end load=$(cut -d' ' -f1-3 /proc/loadavg)"
}

note "campaign start, classes snapshot $(ls -ld /tmp/graft_scaling_classes | awk '{print $6, $7, $8}')"
leg 32 96g 32a
leg 8 24g 8a
compute keyscan_digit_panel 100000000 3 compute
compute dedup_signatures 10000000 3 compute
# bonus second pair — killable without losing the primary
leg 32 96g 32b
leg 8 24g 8b
note DONE
echo DONE
