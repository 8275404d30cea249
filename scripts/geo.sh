#!/usr/bin/env bash
# Stage-1 geometry: train then extract buffers (nerf_runner + gen_geo).
#   scripts/geo.sh <scene> <data_root> [output_root]
set -e
scene="$1"
data_root="$2"
output_root="${3:-./output}"
python -m vqnerf_release_tpu.cli geo-train "$scene" \
  --data-root "$data_root" --output-root "$output_root"
python -m vqnerf_release_tpu.cli gen-geo "$scene" \
  --data-root "$data_root" --output-root "$output_root"
