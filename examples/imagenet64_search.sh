#!/usr/bin/env bash
# BASELINE.md workload 5: ImageNet-64 conditional DDPM, extended T=3000,
# N=64 candidate search sharded over the slice (candidate axis -> mesh).
set -e
python -m itsd_tpu.cli.main search --config configs/imagenet64_cond_search.yaml "$@"
