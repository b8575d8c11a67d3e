#!/usr/bin/env bash
# Fixed-NFE-budget allocation: best-of-N over ancestral vs DDIM-50 vs
# DPM-Solver++-20 candidates from the same on-chip-trained checkpoint.
# Writes docs/results/budget_allocation.{jsonl,png} (~30 min on v5e-1).
set -e
cd "$(dirname "$0")/.."
python experiments/budget_allocation.py --outdir docs/results "$@"
