#!/usr/bin/env bash
# Search-over-paths riding DPM-Solver++(2M) segments: forks/renoising
# happen at the injection points exactly as with the ancestral chain,
# but each segment between them is denoised in a proportional share of a
# 50-eval budget instead of one eval per timestep — the Axis-3 fixed-NFE
# result (docs/RESULTS.md) applied to the forking searches. Swap
# diffusion.sampler=ddim for stochastic-capable segments (ddim_eta).
set -e
python -m itsd_tpu.cli.main search --config configs/cifar10_uncond.yaml \
  state=search search.algorithm=path search.n_paths=16 search.n_active=4 \
  'search.injection_steps=[700,400]' search.delta_f=50 \
  diffusion.sampler=dpm diffusion.ddim_steps=50 \
  search.verifier=self_supervised "$@"
