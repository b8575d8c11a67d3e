#!/usr/bin/env bash
# Compile-only per-chip memory quantification of spatial partitioning +
# ring attention for the 256x256 ch=128 flagship train step, on the
# virtual 8-device CPU mesh (no chip needed, ~25 min on one core):
#   fixed global batch over a fixed pool  -> spatial_memory.json
#   data axis exhausted (the ~1/K regime) -> spatial_memory_fixed_data.json
# See PERF.md "The memory claim, MEASURED".
set -e
cd "$(dirname "$0")/.."
python experiments/spatial_memory.py "$@"
python experiments/spatial_memory.py --fixed-data "$@"
