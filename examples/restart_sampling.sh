#!/usr/bin/env bash
# Restart sampling (Xu et al. 2023): a third inference-time scaling axis
# beyond denoising steps and search — re-noise + re-denoise configured
# intervals, contracting accumulated sampler error with no verifier
# needed. Here: DPM-Solver++-20 base chain with 4 extra bounces over
# [200, 600] (~2x the NFE of the plain chain, restart_nfes-accounted),
# then the same spec driving best-of-4 search candidates.
set -e
python -m itsd_tpu.cli.main eval --config configs/cifar10_uncond.yaml \
  state=eval diffusion.sampler=dpm diffusion.ddim_steps=20 \
  'diffusion.restart_intervals=[[600,200,4]]' "$@"
python -m itsd_tpu.cli.main search --config configs/cifar10_uncond.yaml \
  state=search search.algorithm=random search.n_candidates=4 \
  diffusion.sampler=dpm diffusion.ddim_steps=20 \
  'diffusion.restart_intervals=[[600,200,4]]' \
  search.verifier=self_supervised "$@"
