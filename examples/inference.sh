#!/usr/bin/env bash
# Inference with per-step FID/IS metric tracking
# (/root/reference/example/inference.sh).
set -e
python -m itsd_tpu.cli.main inference-metrics --config configs/inference_config.yaml "$@"
