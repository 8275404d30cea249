#!/bin/bash
# Round-4 follow-on TPU queue (v14). Supersedes queue 13 after the
# plate sch 24+8t25 "repeat" reproduced 34.42 dB EXACTLY — the cells
# are seeded and deterministic, so identical-config repeats measure
# nothing. The 1-3 dB scatter between near-identical configs
# (24+8t25 34.42 vs 24+16t25 32.24 on plate; sphere pure-occ 33.34 vs
# sch t25 30.46) is seed-level chaos: small config changes reshuffle
# the rng stream and land in different basins. The decision therefore
# needs SEED-VARIED cells (smoke_e2e --seed, added for this):
#
#  1. plate  ref 64+64r4  seed1   — the 35.43 bar's own spread
#  2. sphere sch 24+8t25  seed1   — is 30.46 an outlier?
#  3. plate  sch 24+8t25  seed1   — candidate spread on the gap scene
#  4. plate  sch 24+8t25 @120k    — equal-WALL framing
#  5. bench_system_decomp scan,chunk @19 — compressed staging (default)
#  6. same --device-sampling      — the opt-in path
#  7. bench.py at HEAD
#  8. sphere ref 64+64r4 seed1    — (time permitting) ref spread there
#
# Run DETACHED: nohup setsid bash scripts/r4_tpu_queue14.sh \
#                 > /tmp/r4_queue14.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4

stamp() { echo "=== [$(date -u +%H:%M:%S)] $1 ==="; }

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

run_cell plate  "ref 64+64r4"     plate_ref_s1   40000 7200 1
run_cell sphere "sch 24+8t25/128" sphere_t25_s1  40000 4500 1
run_cell plate  "sch 24+8t25/128" plate_t25_s1   40000 4500 1
run_cell plate  "sch 24+8t25/128" plate_t25_ew  120000 9600 0

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

run_cell sphere "ref 64+64r4"     sphere_ref_s1  40000 7200 1
stamp "queue 14 done"
