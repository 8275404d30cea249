#!/usr/bin/env bash
# Dispatcher mirroring decomp/nerfvq_nfr3/scripts/test.sh:
#   scripts/test.sh <scene> <data_root> <test_envmap_dir> [output_root]
set -e
scene="$1"
data_root="$2"
envs="$3"
output_root="${4:-./output}"
python -m vqnerf_release_tpu.cli test "$scene" \
  --data-root "$data_root" --output-root "$output_root" \
  --test-envmap-dir "$envs"
