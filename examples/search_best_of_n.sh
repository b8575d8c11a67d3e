#!/usr/bin/env bash
# Inference-time scaling: best-of-N noise search with a verifier.
# (The reference ships the search library with no entry point; this wires it.)
set -e
python -m itsd_tpu.cli.main search --config configs/cifar10_uncond.yaml \
  state=search search.algorithm=random search.n_candidates=16 \
  search.verifier=self_supervised "$@"
