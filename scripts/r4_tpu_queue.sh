#!/bin/bash
# Round-4 sequential TPU measurement queue. Run DETACHED (nohup setsid)
# from the repo root so it survives driver session restarts:
#   nohup setsid bash scripts/r4_tpu_queue.sh > /tmp/r4_queue.log 2>&1 &
# One job at a time -- the axon tunnel serves a single chip and aborted
# concurrent transfers wedge it (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4

stamp() { echo "=== [$(date -u +%H:%M:%S)] $1 ==="; }

stamp "A: 512px showcase e2e (pipelined extractor; r3 baseline 51.8 min, extraction 1906 s)"
timeout 7200 python scripts/smoke_e2e.py --root /tmp/r4/showcase512 \
  --imh 512 --geo-iters 40000 --epochs 60 --geo-sampler 24+8r2 \
  --occ-res 128 --fast-vis --light-h 8 > /tmp/r4/showcase512.log 2>&1
echo "A exit=$?"

stamp "B: adaptive-empty quality guardrail (equal-step, 4 scenes, default vs adaptive)"
timeout 7200 python scripts/guardrail_scenes.py --root /tmp/r4/guard_adpt \
  --geo-iters 4000 --imh 64 \
  --configs "occ 24+8r2/128,adpt 24+8r2/128" \
  --out-json /tmp/r4/guard_adpt.json > /tmp/r4/guard_adpt.log 2>&1
echo "B exit=$?"

stamp "C: system-level decomp training bench (parallel native sampler)"
timeout 3600 python scripts/bench_system_decomp.py \
  --modes scan,chunk --epochs 19 --chunk 6 \
  > /tmp/r4/system_decomp.log 2>&1
echo "C1 exit=$?"
timeout 3600 python scripts/bench_system_decomp.py \
  --modes chunk --epochs 31 --chunk 12 \
  > /tmp/r4/system_decomp_c12.log 2>&1
echo "C2 exit=$?"

stamp "D: production-budget guardrail (256px / 40k iters, VERDICT #6)"
timeout 28800 python scripts/guardrail_scenes.py --root /tmp/r4/guard_prod \
  --geo-iters 40000 --imh 256 \
  --configs "ref 64+64r4,occ 24+8r2/128,occ 24+16r2/128" \
  --out-json /tmp/r4/guard_prod.json > /tmp/r4/guard_prod.log 2>&1
echo "D exit=$?"

stamp "queue done"
