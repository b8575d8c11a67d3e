#!/bin/bash
# The reference's flagship run — ImageNet 256x256 uncond DDPM, T=1000 —
# mirrors /root/reference/example/imagenet_ep50_bs1024_T1000_lr1e-4.sh.
# On TPU the global batch scales over the mesh's data axis; per-chip batch
# is set in the config. attention_impl=auto selects the Pallas flash
# kernel at the 4096-token stage (the reference's scaling wall — see
# docs/PERF.md "256x256 operating point").
#
# Point data.dataset=imagefolder data.root=<path> at real ImageNet; the
# default uses the procedural shapes dataset so the pipeline runs anywhere.
set -e
cd "$(dirname "$0")/.."

python -m itsd_tpu.cli.main train \
    --config configs/imagenet256_uncond.yaml \
    "$@"
