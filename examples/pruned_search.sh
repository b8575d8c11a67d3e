#!/usr/bin/env bash
# Successive halving over noise: start 16 candidates, keep the top 8 at
# t=700, 4 at t=400, 2 at t=150 — 9 full-denoise-equivalents of NFE vs 16.
# MEASURED on-chip (20 seeds, docs/results/pruned_budget.json): at equal
# NFE, pruned-from-16 beats random best-of-9 on verifier score (E[best]
# -29.8 vs -31.1) with equal independent FID-proxy (5.01 vs 5.13 for full
# best-of-16); full best-of-16 still scores higher (-24.5) at 1.78x the
# NFE. Use pruning to stretch a fixed budget, not to replace a bigger one.
# The verifier-hacking guard is on (warns if the winner's independent
# FID-proxy is worse than an unsearched baseline).
set -e
python -m itsd_tpu.cli.main search --config configs/cifar10_uncond.yaml \
  state=search search.algorithm=pruned search.n_candidates=16 \
  'search.prune_schedule=[[700,8],[400,4],[150,2]]' \
  search.verifier=self_supervised search.guard_proxy=true "$@"
