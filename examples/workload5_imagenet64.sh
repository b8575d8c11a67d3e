#!/usr/bin/env bash
# BASELINE.md workload 5: ImageNet-64 conditional DDPM, extended T=3000,
# best-of-64 CFG search (chunked launches). Add --sampler dpm
# --solver-steps 20 for the 126x-faster second-order-candidate variant.
set -e
cd "$(dirname "$0")/.."
python experiments/workload5_imagenet64.py "$@"
