#!/usr/bin/env bash
# 256x256 flagship training/eval beyond one chip's memory: image rows
# shard over a 'seq' mesh axis (train.spatial_shard=4 -> per-chip
# activation memory drops ~4x; XLA GSPMD halo-exchanges the 3x3 convs)
# and the 4096-token stage-2 attention runs as exact ring attention on
# the same axis (model.attention_impl=ring). Both are numerically equal
# to the unsharded run (tests/test_spatial_partition.py,
# tests/test_ring_attention.py). On a v5e-8, batch here is GLOBAL: each
# chip holds batch x H/4 rows.
set -e
python -m itsd_tpu.cli.main train --config configs/imagenet256_uncond.yaml \
  train.spatial_shard=4 model.attention_impl=ring \
  train.batch_size=16 "$@"
