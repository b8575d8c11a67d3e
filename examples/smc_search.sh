#!/usr/bin/env bash
# Feynman-Kac / SMC particle steering (Singhal et al. 2025): 16 particles
# denoise together and are systematically RESAMPLED (weak die, strong
# multiply — population size constant) at x0-hat checkpoints t=700/400/150,
# with log-weights lambda * (score_t - score_prev) on the verifier score.
# Same NFE as best-of-16 (+3 scoring evals, ~0.3%): the steering-vs-
# independent-draws comparison at equal budget. lambda interpolates from
# untilted sampling (0) to greedy selection (->inf); the ESS gate
# (smc_ess_threshold) keeps resampling from firing on noise.
# Unlike best-of-N, EVERY particle is steered — use the population, not
# just the argmax, when serving multiple outputs.
# smc_lambda_scale=spread z-scores the potential over the population so
# lambda is dimensionless (absolute lambda rides the verifier's score
# scale: at ~40-nat classifier spreads even lambda=2 collapses ESS to ~1).
# Measured on-chip: docs/results/smc_budget.json (experiments/smc_budget.py).
set -e
python -m itsd_tpu.cli.main search --config configs/cifar10_uncond.yaml \
  state=search search.algorithm=smc search.n_candidates=16 \
  'search.smc_resample_steps=[700,400,150]' search.smc_lambda=1.0 \
  search.smc_lambda_scale=spread search.smc_ess_threshold=0.5 \
  search.verifier=self_supervised search.guard_proxy=true "$@"
