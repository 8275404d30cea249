#!/bin/bash
# Round-4 follow-on TPU queue (v7; supersedes queue 6, killed while
# waiting on G2). End-of-round variant: ~2h of round wall remain, so
# the full queue-6 program (F bench + 8-cell G3 + G4 + 150k-iter H1 +
# H2 rescore, ~5h) cannot fit, and anything still holding the TPU when
# the driver's end-of-round bench fires would contend with it and
# corrupt BENCH_r04.json.
#
# Plan:
#  - Let G2 (parity-render occ-tier guardrail, pid $1) finish its
#    PLATE scene — the binding scene — then kill it before the blobs
#    scene starts (blobs already has production-budget train-render
#    evidence in /tmp/r4/guard_prod.json; sacrificing its parity
#    re-score buys the schedule cells below).
#  - Spend the recovered time on the two-phase-schedule cells on the
#    scenes where the occ tiers FAIL the production-budget equal-step
#    bar (plate, torus): sch 24+8t25 first (max-information: if even
#    the 25% parity tail fails plate, the schedule family is dead
#    there), then sch 24+8t10 (the >=10x-tier candidate), then torus.
#  - Hard deadline 18:50Z: no new cell starts after it, and everything
#    is killed at 18:55Z so the driver bench runs uncontended.
# F (bench at HEAD) is dropped: the driver itself runs bench.py at
# round end and records BENCH_r04.json; a 15:53Z HEAD run is already
# in /tmp/r4/bench_head.log.
#
# Run DETACHED: nohup setsid bash scripts/r4_tpu_queue7.sh 23285 \
#                 > /tmp/r4_queue7.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4

G2_PID="${1:?pass the G2 pid}"
DEADLINE=$(date -u -d "18:50" +%s)
HARDSTOP=$(date -u -d "18:55" +%s)
PLATE_WAIT_CAP=$(date -u -d "18:05" +%s)

stamp() { echo "=== [$(date -u +%H:%M:%S)] $1 ==="; }
left() { echo $(( DEADLINE - $(date -u +%s) )); }

stamp "waiting for G2 plate scene (4 cells) or G2 exit"
while ps -p "${G2_PID}" > /dev/null 2>&1; do
  n_plate=$(grep -c "^plate" /tmp/r4/guard_parity.log 2>/dev/null || true)
  if [ "${n_plate:-0}" -ge 4 ]; then
    # NOTE (post-hoc review): killing an in-flight cell risks
    # aborting a host<->device transfer, which wedges the axon
    # tunnel for EVERY process for 30+ min (CLAUDE.md). These
    # kills landed between transfers and got lucky; do NOT reuse
    # this pattern — bound cells with `timeout` instead.
    stamp "plate done (${n_plate} cells) — killing G2 before blobs"
    kill "${G2_PID}" 2>/dev/null
    sleep 10
    kill -9 "${G2_PID}" 2>/dev/null
    break
  fi
  if [ "$(date -u +%s)" -ge "${PLATE_WAIT_CAP}" ]; then
    stamp "18:05Z cap hit mid-plate — killing G2 anyway"
    kill "${G2_PID}" 2>/dev/null
    sleep 10
    kill -9 "${G2_PID}" 2>/dev/null
    break
  fi
  sleep 30
done
sleep 15
stamp "tunnel free; $(left)s to deadline"

run_cell() {  # $1 shape, $2 config, $3 tag
  t=$(left)
  if [ "$t" -lt 600 ]; then
    stamp "skip $3: only ${t}s left"
    return
  fi
  stamp "cell $3 (budget ${t}s)"
  timeout "$t" python scripts/guardrail_scenes.py \
    --root /tmp/r4/guard_sched --geo-iters 40000 --imh 256 --save-ckpt \
    --shapes "$1" --configs "$2" \
    --out-json /tmp/r4/guard_sched_"$3".json \
    > /tmp/r4/guard_sched_"$3".log 2>&1 &
  echo $! > /tmp/r4/cell.pid
  wait $!
  echo "$3 exit=$?"
  grep -E "^(plate|torus|sphere|blobs) " /tmp/r4/guard_sched_"$3".log
}

run_cell plate "sch 24+8t25/128" plate_t25
run_cell plate "sch 24+8t10/128" plate_t10
run_cell torus "sch 24+8t10/128" torus_t10

# belt-and-braces: nothing of ours may outlive 18:55Z
while [ "$(date -u +%s)" -lt "${HARDSTOP}" ]; do sleep 10; done
[ -f /tmp/r4/cell.pid ] && kill "$(cat /tmp/r4/cell.pid)" 2>/dev/null
stamp "queue 7 done"
