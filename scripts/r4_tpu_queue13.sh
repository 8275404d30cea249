#!/bin/bash
# Round-4 follow-on TPU queue (v13). Supersedes queue 12 after the
# sphere sch 24+8t25 cell (30.46 parity) landed 2.9 dB below the pure
# occ 24+8 tier (33.34) — together with the plate 24+16t25 swing this
# says the 40k/256px cells carry ~1-3 dB RUN-TO-RUN variance, so the
# default decision needs repeat cells, including the REF bar's own
# spread, before any BASELINE.md language. Waits for the in-flight
# plate_t25_rep cell, then:
#
#  1. plate  ref 64+64r4 REPEAT — is the 35.43 bar itself +-1.5 dB?
#     (the most decision-critical unknown; ~95 min cell)
#  2. sphere sch 24+8t25 REPEAT — second sample of the 30.46 outlier.
#  3. plate  sch 24+8t25 @120k — equal-WALL framing (~the ref cell's
#     wall at 3x the steps).
#  4. bench_system_decomp scan,chunk @19 epochs — compressed staging +
#     device sampling OFF (default-path measurement vs the r4 rows).
#  5. same with --device-sampling — the opt-in path's system number.
#  6. bench.py at HEAD.
#
# Run DETACHED: nohup setsid bash scripts/r4_tpu_queue13.sh <cell_pid> \
#                 > /tmp/r4_queue13.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4

CELL_PID="${1:?pass the in-flight plate_t25_rep timeout pid}"
stamp() { echo "=== [$(date -u +%H:%M:%S)] $1 ==="; }

stamp "waiting for plate_t25_rep cell (pid ${CELL_PID})"
while ps -p "${CELL_PID}" > /dev/null 2>&1; do sleep 30; done
sleep 15
grep -E "^(plate|torus|sphere|blobs) " \
  /tmp/r4/guard_sched_plate_t25_rep.log 2>/dev/null
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

run_cell plate  "ref 64+64r4"     plate_ref_rep  40000 7200
run_cell sphere "sch 24+8t25/128" sphere_t25_rep 40000 4500
run_cell plate  "sch 24+8t25/128" plate_t25_ew  120000 9600

stamp "system decomp (scan,chunk — r4 protocol: 19 epochs)"
timeout 3600 python scripts/bench_system_decomp.py \
  --modes scan,chunk --epochs 19 \
  > /tmp/r4/system_decomp_compressed.log 2>&1
echo "exit=$?"
tail -4 /tmp/r4/system_decomp_compressed.log

stamp "system decomp with device sampling"
timeout 3600 python scripts/bench_system_decomp.py \
  --modes scan,chunk --epochs 19 --device-sampling \
  > /tmp/r4/system_decomp_devsample.log 2>&1
echo "exit=$?"
tail -4 /tmp/r4/system_decomp_devsample.log

stamp "bench.py at HEAD"
timeout 3600 python bench.py > /tmp/r4/bench_head.log 2>&1
echo "bench exit=$?"
tail -2 /tmp/r4/bench_head.log
stamp "queue 13 done"
