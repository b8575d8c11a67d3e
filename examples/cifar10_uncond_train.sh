#!/usr/bin/env bash
# CIFAR-10 unconditional DDPM training (BASELINE.md workload 1).
# TPU analogue of /root/reference/example/imagenet_ep50_bs1024_T1000_lr1e-4.sh
set -e
python -m itsd_tpu.cli.main train --config configs/cifar10_uncond.yaml "$@"
