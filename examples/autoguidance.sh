#!/usr/bin/env bash
# Autoguidance vs CFG at equal NFE on the trained conditional artifact
# (Karras et al. 2024): half-trained twin at w=0.5 beats CFG w=1.8 on
# class control (docs/results/autoguidance.json; ~40 min on v5e-1).
# Product knob: diffusion.guidance=auto diffusion.weak_load_weight=<ckpt>.
set -e
cd "$(dirname "$0")/.."
python experiments/train_artifacts.py --only shapes64_cond_weak
python experiments/train_artifacts.py --only shapes64_cond_mid
python experiments/autoguidance.py --seeds 3 "$@"
python experiments/autoguidance.py --seeds 3 --weak-name shapes64_cond_mid --tag _mid "$@"
