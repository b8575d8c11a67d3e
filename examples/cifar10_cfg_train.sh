#!/usr/bin/env bash
# CIFAR-10 classifier-free-guidance training (MainCondition.py workload).
set -e
python -m itsd_tpu.cli.main train --config configs/cifar10_cfg.yaml "$@"
