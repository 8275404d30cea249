#!/bin/bash
# Round-4 follow-on TPU queue (v4; supersedes the tail of queue 3 —
# its shell was retired after launching G2 so the sampler-SCHEDULE
# guardrail could be ordered ahead of the fastvis validation).
#
# Waits for G2 (the parity-render occ-tier guardrail) to release the
# axon tunnel, then:
#   F:  bench.py at HEAD.
#   G3: production-budget guardrail of the two-phase sampler schedules
#       (cheap occ carving + 10% parity tail): the schedule is the
#       candidate that could carry a >=10x tier past the quality gate
#       if the flat 16+8 tier fails it, and fix any real 24+8
#       production-budget regression.
#   E:  span/occ-guided reduced vis sampler validation on the scenes
#       that killed the plain reduced sampler in r2.
#
# Run DETACHED: nohup setsid bash scripts/r4_tpu_queue4.sh \
#                 > /tmp/r4_queue4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4

stamp() { echo "=== [$(date -u +%H:%M:%S)] $1 ==="; }

stamp "waiting for G2 (guard_parity guardrail) to exit"
G2_PID=$(ps -eo pid,cmd | awk '/guardrail_scenes\.py --root .tmp.r4.guard_parity/ && !/awk/ {print $1; exit}')
while [ -n "${G2_PID}" ] && ps -p "${G2_PID}" > /dev/null 2>&1; do
  sleep 60
done
stamp "tunnel free"

stamp "F: bench.py at HEAD"
timeout 3600 python bench.py > /tmp/r4/bench_head.log 2>&1
echo "F exit=$?"
tail -1 /tmp/r4/bench_head.log

stamp "G3: production-budget schedule guardrail (256px/40k)"
timeout 21600 python scripts/guardrail_scenes.py --root /tmp/r4/guard_sched \
  --geo-iters 40000 --imh 256 --save-ckpt \
  --configs "sch 24+8t10/128,sch 16+8t10/128" \
  --out-json /tmp/r4/guard_sched.json > /tmp/r4/guard_sched.log 2>&1
echo "G3 exit=$?"

for shape in plate blobs sphere; do
  stamp "E: validate span/occ-guided reduced vis sampler ($shape)"
  timeout 3600 python scripts/validate_fastvis.py --shape "$shape" \
    --vis-sampler 32+16r2 --root /tmp/r4/fastvis_$shape \
    > /tmp/r4/fastvis_$shape.log 2>&1
  echo "E($shape) exit=$?"
done

stamp "queue 4 done"
