#!/bin/bash
# Round-4 follow-on TPU queue (v12). Supersedes queues 10/11 after the
# plate 24+16t25 cell came in at 32.24 dB parity — BELOW both the 24+8
# carve schedule (34.42) and the pure 24+16 tier (33.44), so the
# roomier-carve hypothesis is dead and the candidate default is
# sch 24+8t25. Waits for the in-flight torus 24+16t25 cell (kept as a
# carve-width/variance probe on a scene with a known 24+8t25 number),
# then:
#
#  1. blobs  sch 24+8t25 / 2. sphere sch 24+8t25 — full-matrix
#     confirmation for the CANDIDATE (equal-step, parity-scored).
#  3. plate  sch 24+8t25 REPEAT — the 2.2 dB swing between plate
#     schedule cells suggests large run spread; the candidate's plate
#     number needs a second sample before any default language.
#  4. plate  sch 24+8t25 @120k iters — equal-WALL framing.
#  5. bench_system_decomp scan,chunk @19 epochs — measures the
#     compressed pix staging (train/loop.py::_encode_pairs) against the
#     r4 rows (751.2k scan / 836.8k chunk).
#  6. bench.py at HEAD.
#
# Run DETACHED: nohup setsid bash scripts/r4_tpu_queue12.sh <torus_pid> \
#                 > /tmp/r4_queue12.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4

TORUS_PID="${1:?pass the in-flight torus cell timeout pid}"
stamp() { echo "=== [$(date -u +%H:%M:%S)] $1 ==="; }

stamp "waiting for torus 24+16t25 cell (pid ${TORUS_PID})"
while ps -p "${TORUS_PID}" > /dev/null 2>&1; do sleep 30; done
sleep 15
grep -E "^(plate|torus|sphere|blobs) " \
  /tmp/r4/guard_sched_torus_2416t25.log 2>/dev/null
stamp "tunnel free"

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

run_cell blobs  "sch 24+8t25/128" blobs_t25     40000 4500
run_cell sphere "sch 24+8t25/128" sphere_t25    40000 4500
run_cell plate  "sch 24+8t25/128" plate_t25_rep 40000 4500
run_cell plate  "sch 24+8t25/128" plate_t25_ew 120000 9600

stamp "system decomp (scan,chunk — r4 protocol: 19 epochs)"
timeout 3600 python scripts/bench_system_decomp.py \
  --modes scan,chunk --epochs 19 \
  > /tmp/r4/system_decomp_compressed.log 2>&1
echo "exit=$?"
tail -4 /tmp/r4/system_decomp_compressed.log

stamp "bench.py at HEAD"
timeout 3600 python bench.py > /tmp/r4/bench_head.log 2>&1
echo "bench exit=$?"
tail -2 /tmp/r4/bench_head.log
stamp "queue 12 done"
