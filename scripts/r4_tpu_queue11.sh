#!/bin/bash
# Round-4 follow-on TPU queue (v11). Arms itself behind queue 10 (polls
# its log for the completion stamp), then measures the compressed pix
# staging (train/loop.py::_encode_pairs — 5 bytes/pair vs 8 through the
# serializing tunnel) at the system level, and records bench.py at HEAD:
#
#  1. bench_system_decomp chunk mode  — vs the r4 836.8k rays/s row
#  2. bench_system_decomp scan mode   — vs the r4 751.2k row
#  3. bench.py                        — HEAD record for the round
#
# Run DETACHED: nohup setsid bash scripts/r4_tpu_queue11.sh \
#                 > /tmp/r4_queue11.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4

stamp() { echo "=== [$(date -u +%H:%M:%S)] $1 ==="; }

stamp "waiting for queue 10"
while ! grep -q "queue 10 done" /tmp/r4_queue10.log 2>/dev/null; do
  sleep 60
done
sleep 15
stamp "tunnel free"

stamp "system decomp (scan,chunk — r4 protocol: 19 epochs)"
timeout 3600 python scripts/bench_system_decomp.py \
  --modes scan,chunk --epochs 19 \
  > /tmp/r4/system_decomp_compressed.log 2>&1
echo "exit=$?"
tail -4 /tmp/r4/system_decomp_compressed.log

stamp "bench.py at HEAD"
timeout 3600 python bench.py > /tmp/r4/bench_head.log 2>&1
echo "bench exit=$?"
tail -2 /tmp/r4/bench_head.log
stamp "queue 11 done"
