#!/bin/bash
# Round-4 follow-on TPU queue (v8). Runs after queue 7's end-of-round
# cap turned out not to be the end of the round (the driver granted a
# fresh window). Completes the two-phase-schedule evidence the r4
# production-budget guardrail demands before any default flip:
#
#  1. torus t25  — does the schedule fix the OTHER failing scene?
#     (production-budget bars, parity-scored: torus ref 32.28, best occ
#     tier 31.45; plate ref 35.43, sch t25 34.42 / t10 33.24)
#  2. plate t40  — does a longer tail close the last 1.0 dB on plate?
#  3. blobs t25 / 4. sphere t25 — full-matrix confirmation cells for
#     the candidate default (equal-step, parity-scored).
#  5. plate equal-WALL — sch 24+8t25 at 120k iters (~3x the steps in
#     roughly the wall the ref 64+64r4 spends on 40k): the
#     production-relevant framing — quality per wall-clock hour.
#  6. torus t40  — contingency if torus t25 lands below the bar.
#
# Each cell bounded; results land in /tmp/r4/guard_sched_<tag>.json.
# Run DETACHED: nohup setsid bash scripts/r4_tpu_queue8.sh \
#                 > /tmp/r4_queue8.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4

stamp() { echo "=== [$(date -u +%H:%M:%S)] $1 ==="; }

run_cell() {  # $1 shape, $2 config, $3 tag, $4 iters, $5 timeout_s
  stamp "cell $3 (iters $4, cap $5s)"
  timeout "$5" python scripts/guardrail_scenes.py \
    --root /tmp/r4/guard_sched --geo-iters "$4" --imh 256 --save-ckpt \
    --shapes "$1" --configs "$2" \
    --out-json /tmp/r4/guard_sched_"$3".json \
    > /tmp/r4/guard_sched_"$3".log 2>&1 &
  echo $! > /tmp/r4/cell.pid
  wait $!
  echo "$3 exit=$?"
  grep -E "^(plate|torus|sphere|blobs) " /tmp/r4/guard_sched_"$3".log
}

run_cell torus  "sch 24+8t25/128" torus_t25  40000 4000
run_cell plate  "sch 24+8t40/128" plate_t40  40000 5400
run_cell blobs  "sch 24+8t25/128" blobs_t25  40000 4000
run_cell sphere "sch 24+8t25/128" sphere_t25 40000 4000
run_cell plate  "sch 24+8t25/128" plate_t25_ew 120000 9000
run_cell torus  "sch 24+8t40/128" torus_t40  40000 5400
stamp "queue 8 done"
