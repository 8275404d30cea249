#!/bin/bash
# Round-4 follow-on TPU queue: waits for the first queue (guardrail D)
# to release the axon tunnel, then
#   E: validates the span/occ-guided reduced occlusion sampler (the
#      unmeasured extraction lever) on the scenes that killed the plain
#      reduced sampler in r2,
#   F: re-runs bench.py at HEAD,
#   G: production-budget (256px/40k) quality of the >=10x throughput
#      tiers (occ 16+8r2 / 16+16r2 @128^3) vs the ref bars measured by
#      queue 1's job D — if a 10x tier still beats the reference
#      config's own PSNR at production budget, the north-star
#      quality argument changes.
# Run DETACHED:
#   nohup setsid bash scripts/r4_tpu_queue2.sh > /tmp/r4_queue2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4

stamp() { echo "=== [$(date -u +%H:%M:%S)] $1 ==="; }

stamp "waiting for queue 1 (r4_tpu_queue.sh) to exit"
q1=$(ps -eo pid,cmd | awk '/[r]4_tpu_queue\.sh/ {print $1; exit}')
while [ -n "$q1" ] && ps -p "$q1" > /dev/null 2>&1; do
  sleep 60
done
stamp "queue 1 done; tunnel free"

for shape in plate blobs sphere; do
  stamp "E: validate span/occ-guided reduced vis sampler ($shape)"
  timeout 3600 python scripts/validate_fastvis.py --shape "$shape" \
    --vis-sampler 32+16r2 --root /tmp/r4/fastvis_$shape \
    > /tmp/r4/fastvis_$shape.log 2>&1
  echo "E($shape) exit=$?"
done

stamp "F: bench.py at HEAD"
timeout 3600 python bench.py > /tmp/r4/bench_head.log 2>&1
echo "F exit=$?"

stamp "G: production-budget quality of the 10x throughput tiers"
timeout 14400 python scripts/guardrail_scenes.py --root /tmp/r4/guard_10x \
  --geo-iters 40000 --imh 256 \
  --configs "occ 16+8r2/128,occ 16+16r2/128" \
  --out-json /tmp/r4/guard_10x.json > /tmp/r4/guard_10x.log 2>&1
echo "G exit=$?"

stamp "queue 2 done"
