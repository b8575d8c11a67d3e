#!/usr/bin/env bash
# Successive halving over noise: start 16 candidates, keep the top 8 at
# t=700, 4 at t=400, 2 at t=150 — ~half the NFE of best-of-16, with the
# verifier-hacking guard on (warns if the winner's independent FID-proxy
# is worse than an unsearched baseline).
set -e
python -m itsd_tpu.cli.main search --config configs/cifar10_uncond.yaml \
  state=search search.algorithm=pruned search.n_candidates=16 \
  'search.prune_schedule=[[700,8],[400,4],[150,2]]' \
  search.verifier=self_supervised search.guard_proxy=true "$@"
