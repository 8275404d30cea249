#!/bin/bash
# Round-4 follow-on TPU queue (v10). The VM restarted before queue 8's
# tail and queue 9 ran; /tmp/r4 was wiped. Re-runs the still-unmeasured
# production-budget schedule cells, re-prioritized by decision value:
#
#  1. plate  sch 24+16t25 — DECISION CELL: the plate tail sweep
#     saturated ~1.0 dB under the ref bar with the 24+8 carve; pure
#     24+16 reaches 33.44 parity-scored. If the roomier carve + t25
#     tail clears ~35.4, the schedule default candidate is complete.
#  2. torus  sch 24+16t25 — matrix completeness for that candidate
#     (torus already PASSES at 24+8t25, +1.78 dB).
#  3. blobs  sch 24+16t25 / 4. sphere sch 24+16t25 — full-matrix
#     confirmation (blobs/sphere never regressed, cheap insurance).
#  5. plate  sch 24+8t25 @120k iters — equal-WALL framing (~the ref
#     64+64r4 cell's 40k-iter wall): quality per wall-clock hour.
#
# Each cell bounded; results land in /tmp/r4/guard_sched_<tag>.json.
# Run DETACHED: nohup setsid bash scripts/r4_tpu_queue10.sh \
#                 > /tmp/r4_queue10.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4

stamp() { echo "=== [$(date -u +%H:%M:%S)] $1 ==="; }

run_cell() {  # $1 shape, $2 config, $3 tag, $4 iters, $5 timeout_s
  if [ -f /tmp/r4/guard_sched_"$3".json ]; then
    stamp "cell $3 already done, skipping"; return
  fi
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

run_cell plate  "sch 24+16t25/128" plate_2416t25  40000 5400
run_cell torus  "sch 24+16t25/128" torus_2416t25  40000 5400
run_cell blobs  "sch 24+16t25/128" blobs_2416t25  40000 5400
run_cell sphere "sch 24+16t25/128" sphere_2416t25 40000 5400
run_cell plate  "sch 24+8t25/128"  plate_t25_ew  120000 9600
stamp "queue 10 done"
