#!/usr/bin/env bash
# SMC resample-checkpoint placement sweep at the measured lambda knee
# (lambda_temp=0.2): 5 equal-NFE placements x 10 seeds on the trained
# shapes32 artifact. Writes docs/results/smc_placement.json
# (~30 min on v5e-1). See RESULTS.md Axis 5.
set -e
cd "$(dirname "$0")/.."
python experiments/smc_placement.py --seeds 10 "$@"
