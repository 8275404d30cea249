#!/usr/bin/env bash
# One-command parity acceptance run (reference: scripts/test.sh + test.py
# + metric_eval.py). See scripts/acceptance.py for the full flag surface.
#   scripts/acceptance.sh <scene> <data_root> <gt_root> <envmap_dir> \
#       [extra acceptance.py flags...]
set -e
scene="$1"; data_root="$2"; gt_root="$3"; envs="$4"; shift 4
exec python "$(dirname "$0")/acceptance.py" "$scene" \
  --data-root "$data_root" --gt-root "$gt_root" \
  --test-envmap-dir "$envs" --output-root "${OUTPUT_ROOT:-./output}" "$@"
