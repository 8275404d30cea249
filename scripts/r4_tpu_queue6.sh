#!/bin/bash
# Round-4 follow-on TPU queue (v6; supersedes queue 5, which was
# retired while still waiting on G2 — nothing of it had run. Drops
# step E: the span/occ reduced vis sampler re-validation already ran
# (15:19-15:42, /tmp/r4/fastvis_*.log) and is recorded in BASELINE.md).
#
# Waits for G2 (the parity-render occ-tier guardrail, PID passed as
# $1 or discovered from the known launch) to exit, then:
#   F:  bench.py at HEAD.
#   G3: production-budget guardrail of the two-phase sampler schedules
#       (cheap occ carving + 10% parity tail) — the candidate that
#       could carry a >=10x tier past the quality gate.
#   G4: longer-tail insurance on the binding scene (plate, 25% tail).
#   H1: EQUAL-WALL-CLOCK plate cell — occ 24+8 at 150k iters, the same
#       wall time as the reference sampler's 40k (3.73x steps/s).
#   H2: parity-render rescore of every saved cell over both val views.
#
# Run DETACHED: nohup setsid bash scripts/r4_tpu_queue6.sh <G2_PID> \
#                 > /tmp/r4_queue6.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4 /tmp/r4/rescore

stamp() { echo "=== [$(date -u +%H:%M:%S)] $1 ==="; }

G2_PID="${1:-}"
if [ -n "${G2_PID}" ]; then
  stamp "waiting for G2 (pid ${G2_PID}) to exit"
  while ps -p "${G2_PID}" > /dev/null 2>&1; do
    sleep 60
  done
fi
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

stamp "G4: 25%-tail insurance cell (plate)"
timeout 7200 python scripts/guardrail_scenes.py --root /tmp/r4/guard_sched25 \
  --geo-iters 40000 --imh 256 --save-ckpt --shapes plate \
  --configs "sch 24+8t25/128" \
  --out-json /tmp/r4/guard_sched25.json > /tmp/r4/guard_sched25.log 2>&1
echo "G4 exit=$?"

stamp "H1: equal-wall-clock plate cell (occ 24+8, 150k iters)"
timeout 10800 python scripts/smoke_e2e.py \
  --root /tmp/r4/equalwall_plate --shape plate --stage1-only \
  --geo-iters 150000 --imh 256 --geo-sampler 24+8r2 --occ-res 128 \
  --save-ckpt > /tmp/r4/equalwall_plate.log 2>&1
echo "H1 exit=$?"
grep "PSNR" /tmp/r4/equalwall_plate.log

stamp "H2: parity rescore of every saved cell over val views"
for cell in /tmp/r4/guard_parity/*/*/ /tmp/r4/guard_sched/*/*/ \
            /tmp/r4/guard_sched25/*/*/ /tmp/r4/equalwall_plate/; do
  [ -d "$cell/exp/checkpoints" ] || continue
  tag=$(echo "$cell" | sed 's#/tmp/r4/##; s#/$##; s#/#_#g')
  timeout 1800 python scripts/rescore_ckpt.py --root "$cell" \
    --sampler 64+64r4 --views val \
    --out-json /tmp/r4/rescore/"$tag".json \
    > /tmp/r4/rescore/"$tag".log 2>&1
  echo "H2($tag) exit=$? $(grep -o 'mean over.*' /tmp/r4/rescore/$tag.log | tail -1)"
done

stamp "queue 6 done"
