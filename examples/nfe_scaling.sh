#!/usr/bin/env bash
# Reproduce the paper's headline claim end-to-end on one TPU chip:
# verifier score vs NFE for denoising-step scaling (saturates) and for
# random / zero-order / path search (keeps climbing).
# Writes docs/results/nfe_scaling.jsonl + nfe_scaling.png + sample grids
# (~50 min on v5e-1).
set -e
cd "$(dirname "$0")/.."
python experiments/nfe_scaling.py --train-steps 12000 --outdir docs/results "$@"
