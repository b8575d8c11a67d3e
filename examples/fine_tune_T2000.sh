#!/usr/bin/env bash
# Extend a T=1000 table-embedding checkpoint to T=2000 and fine-tune only
# the time embedding (/root/reference/example/fine_tune_T2000.sh).
set -e
python -m itsd_tpu.cli.main finetune-t --config configs/fine_tune_config.yaml "$@"
