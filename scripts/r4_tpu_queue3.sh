#!/bin/bash
# Round-4 follow-on TPU queue (v3; replaces r4_tpu_queue2.sh whose shell
# died with a driver session restart before starting any job).
#
# Waits for queue 1's production-budget guardrail (job D) to release the
# axon tunnel, then:
#   G2: PARITY-RENDER production-budget guardrail of every occ tier.
#       Queue 1's job D scored each cell with its own TRAINING sampler
#       render, but production (cli._geo_cfgs) always extracts with the
#       reference-parity 64+64r4 sampler — so D's occ PSNRs measure val
#       quadrature, not trained-SDF quality, and are unfairly low. The
#       ref cells ARE production-faithful (training sampler == parity
#       sampler), so only occ tiers re-run. Includes the >=10x
#       throughput tiers (16+8/16+16): if one holds the ref bar at
#       production budget under the parity render, the shipped default
#       can move to >=10x.
#   F:  bench.py at HEAD.
#   E:  span/occ-guided reduced vis sampler validation on the scenes
#       that killed the plain reduced sampler in r2.
#
# Run DETACHED: nohup setsid bash scripts/r4_tpu_queue3.sh \
#                 > /tmp/r4_queue3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4

stamp() { echo "=== [$(date -u +%H:%M:%S)] $1 ==="; }

stamp "waiting for queue-1 job D (guardrail pid) to exit"
D_PID=$(ps -eo pid,cmd | awk '/guardrail_scenes\.py --root .tmp.r4.guard_prod/ && !/awk/ {print $1; exit}')
while [ -n "${D_PID}" ] && ps -p "${D_PID}" > /dev/null 2>&1; do
  sleep 60
done
stamp "tunnel free"

stamp "G2: parity-render production-budget guardrail (occ tiers, 256px/40k)"
timeout 21600 python scripts/guardrail_scenes.py --root /tmp/r4/guard_parity \
  --geo-iters 40000 --imh 256 --save-ckpt \
  --configs "occ 24+8r2/128,occ 24+16r2/128,occ 16+8r2/128,occ 16+16r2/128" \
  --out-json /tmp/r4/guard_parity.json > /tmp/r4/guard_parity.log 2>&1
echo "G2 exit=$?"

stamp "F: bench.py at HEAD"
timeout 3600 python bench.py > /tmp/r4/bench_head.log 2>&1
echo "F exit=$?"
tail -1 /tmp/r4/bench_head.log

for shape in plate blobs sphere; do
  stamp "E: validate span/occ-guided reduced vis sampler ($shape)"
  timeout 3600 python scripts/validate_fastvis.py --shape "$shape" \
    --vis-sampler 32+16r2 --root /tmp/r4/fastvis_$shape \
    > /tmp/r4/fastvis_$shape.log 2>&1
  echo "E($shape) exit=$?"
done

stamp "queue 3 done"
