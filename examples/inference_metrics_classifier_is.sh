#!/usr/bin/env bash
# C31 inference-metrics on the trained 256x256 flagship at the reference's
# extended-T operating point, with tracked IS routed to the trained
# in-domain classifier (train.is_logit_source=auto finds
# artifacts/classifier_shapes256; random-weight Inception IS is
# identically 1.0 in zero-egress environments). ~20 min on v5e-1.
set -e
cd "$(dirname "$0")/.."
python experiments/flagship_inference_metrics.py "$@"
