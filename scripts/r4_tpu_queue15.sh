#!/bin/bash
# Round-4 final TPU queue (v15) — after the seed-varied cells landed
# and the stage-1 default flipped to the two-phase schedule
# (occ 24+8/128 carve 75% -> 64+64r4 parity tail 25%):
#
#  1. 512px showcase e2e at the NEW default (the headline pipeline
#     number must reflect the shipped default; r3-default showcase was
#     40.8 min / recon 32.01 — the tail adds ~20 min of stage-1 wall
#     and buys production-budget quality robustness)
#  2. sphere sch 24+16t25 — does the roomier carve close the sphere
#     gap to the ref sampler's good seed (32.93 vs sch 24+8t25's
#     30.3-30.5)?
#  3. torus sch 24+8t25 seed1 — seed spread on the schedule's
#     strongest scene
#  4. blobs sch 24+8t25 seed1 — same on blobs
#  5. bench.py at final HEAD
#
# Run DETACHED: nohup setsid bash scripts/r4_tpu_queue15.sh \
#                 > /tmp/r4_queue15.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4

stamp() { echo "=== [$(date -u +%H:%M:%S)] $1 ==="; }

stamp "512px showcase at the schedule default"
if [ -f /tmp/r4/showcase512_sched.log ] && \
   grep -q "recon" /tmp/r4/showcase512_sched.log 2>/dev/null; then
  stamp "showcase already done, skipping"
else
  timeout 10800 python scripts/smoke_e2e.py \
    --root /tmp/r4/showcase512_sched \
    --imh 512 --geo-iters 40000 --epochs 60 --geo-sampler 24+8r2 \
    --occ-res 128 --geo-tail-frac 0.25 --fast-vis --light-h 8 \
    > /tmp/r4/showcase512_sched.log 2>&1 &
  echo $! > /tmp/r4/cell.pid
  wait $!
  echo "showcase exit=$?"
  tail -12 /tmp/r4/showcase512_sched.log
fi

run_cell() {  # $1 shape, $2 config, $3 tag, $4 iters, $5 timeout, $6 seed
  if [ -f /tmp/r4/guard_sched_"$3".json ]; then
    stamp "cell $3 already done, skipping"; return
  fi
  stamp "cell $3 (iters $4, cap $5s, seed $6)"
  timeout "$5" python scripts/guardrail_scenes.py \
    --root /tmp/r4/guard_sched --geo-iters "$4" --imh 256 --save-ckpt \
    --seed "$6" --shapes "$1" --configs "$2" \
    --out-json /tmp/r4/guard_sched_"$3".json \
    > /tmp/r4/guard_sched_"$3".log 2>&1 &
  echo $! > /tmp/r4/cell.pid
  wait $!
  echo "$3 exit=$?"
  grep -E "^(plate|torus|sphere|blobs) " /tmp/r4/guard_sched_"$3".log
}

run_cell sphere "sch 24+16t25/128" sphere_2416t25 40000 5400 0
run_cell torus  "sch 24+8t25/128"  torus_t25_s1   40000 4500 1
run_cell blobs  "sch 24+8t25/128"  blobs_t25_s1   40000 4500 1

stamp "bench.py at final HEAD"
timeout 3600 python bench.py > /tmp/r4/bench_final.log 2>&1
echo "bench exit=$?"
tail -2 /tmp/r4/bench_final.log

stamp "system decomp with device sampling (post contrast-precompute)"
timeout 3600 python scripts/bench_system_decomp.py \
  --modes scan,chunk --epochs 19 --device-sampling \
  > /tmp/r4/system_decomp_devsample2.log 2>&1
echo "exit=$?"
tail -4 /tmp/r4/system_decomp_devsample2.log
stamp "queue 15 done"
