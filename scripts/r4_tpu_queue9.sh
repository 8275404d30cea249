#!/bin/bash
# Round-4 follow-on TPU queue (v9). Arms itself behind queue 8:
# waits for the plate equal-wall cell's JSON, then kills queue 8's
# final torus_t40 cell (moot — torus already PASSES at t25, +1.78 dB
# over the ref bar) and runs the roomier-carve schedule cells the
# plate tail sweep (t10 33.24 / t25 34.42 / t40 33.90, all below the
# ref 35.43) points to: the 24+8 CARVE phase is the limiting factor on
# the thin plate, not tail length, so carve with 24+16 instead.
#
#  1. plate  sch 24+16t25 — the candidate that decides the default
#  2. torus  sch 24+16t25 — matrix completeness for that candidate
#
# Run DETACHED: nohup setsid bash scripts/r4_tpu_queue9.sh <q8_pid> \
#                 > /tmp/r4_queue9.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4

Q8_PID="${1:?pass queue8 bash pid}"
stamp() { echo "=== [$(date -u +%H:%M:%S)] $1 ==="; }

stamp "waiting for queue8's plate_t25_ew cell to finish"
while [ ! -f /tmp/r4/guard_sched_plate_t25_ew.json ]; do
  ps -p "${Q8_PID}" > /dev/null 2>&1 || { stamp "queue8 gone"; break; }
  sleep 30
done

# skip queue8's last cell (torus_t40) the moment it starts: kill the
# pid recorded in cell.pid iff its cmdline is the torus_t40 guardrail
while ps -p "${Q8_PID}" > /dev/null 2>&1; do
  p=$(cat /tmp/r4/cell.pid 2>/dev/null || true)
  if [ -n "${p}" ] && [ -r "/proc/${p}/cmdline" ] \
     && tr '\0' ' ' < "/proc/${p}/cmdline" | grep -q "torus_t40"; then
    # NOTE (post-hoc review): killing an in-flight cell risks
    # aborting a host<->device transfer, which wedges the axon
    # tunnel for EVERY process for 30+ min (CLAUDE.md). These
    # kills landed between transfers and got lucky; do NOT reuse
    # this pattern — bound cells with `timeout` instead.
    stamp "killing queue8's torus_t40 cell (pid ${p})"
    kill "${p}" 2>/dev/null
    sleep 5
    kill -9 "${p}" 2>/dev/null
  fi
  sleep 10
done
sleep 15
stamp "tunnel free"

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

run_cell plate "sch 24+16t25/128" plate_2416t25 40000 4500
run_cell torus "sch 24+16t25/128" torus_2416t25 40000 4500
stamp "queue 9 done"
