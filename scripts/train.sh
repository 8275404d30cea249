#!/usr/bin/env bash
# Dispatcher mirroring decomp/nerfvq_nfr3/scripts/train.sh:
#   scripts/train.sh <scene> <data_root> [output_root]
# Runs all three decomposition phases for the scene's dataset family.
set -e
scene="$1"
data_root="$2"
output_root="${3:-./output}"
python -m vqnerf_release_tpu.cli decomp-train "$scene" \
  --data-root "$data_root" --output-root "$output_root" --phase all
