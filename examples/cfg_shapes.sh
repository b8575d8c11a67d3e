#!/usr/bin/env bash
# Classifier-free guidance quantified on-chip: train the conditional UNet
# on labeled shapes, sweep w, measure class-control accuracy + FID-proxy.
# Writes docs/results/cfg_shapes.jsonl + per-w grids (~20 min on v5e-1).
set -e
cd "$(dirname "$0")/.."
python experiments/cfg_shapes.py --outdir docs/results "$@"
