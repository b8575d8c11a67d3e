#!/usr/bin/env bash
# Train at T=1000, evaluate at inference_T=2000 — the train/inference-T split
# (/root/reference/example/train_val_imagenet_ep15_bs40_T3000_lr1e-4.sh).
# Functional time embedding makes the T split free: no surgery needed.
set -e
python -m itsd_tpu.cli.main train --config configs/cifar10_uncond.yaml \
  epoch=15 batch_size=40 inference_T=2000 "$@"
