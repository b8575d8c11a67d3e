#!/usr/bin/env bash
# Interval-restricted classifier-free guidance (Kynkaanniemi et al. 2024):
# `diffusion.cfg_interval=[lo,hi]` runs the dual-batched CFG forward only
# for timesteps lo <= t < hi; outside, each step is ONE conditional forward
# under lax.cond, cutting model evals from 2T to T + (hi-lo)
# (core.process.cfg_nfes) while keeping guidance where it pays. The knob is
# honored by eval / search / inference-metrics (cli/runner.py), e.g.:
#
#   python -m itsd_tpu.cli.main eval --config configs/cifar10_cfg.yaml \
#       'diffusion.cfg_interval=[0,1500]'
#
# Sweeps share ONE compiled program: make_cfg_eps_fn accepts traced scalar
# w/lo/hi (tests/test_process.py::test_cfg_interval_traced_scalars_one_program).
# This script reproduces the on-chip arm measurement (full-range vs
# low-t / mid / high-t halves at equal w on the trained shapes64_cond
# artifact) -> docs/results/cfg_interval.json.
set -e
cd "$(dirname "$0")/.."
python experiments/cfg_interval.py "$@"
