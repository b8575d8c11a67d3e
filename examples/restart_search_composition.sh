#!/usr/bin/env bash
# Does restart sampling STACK with best-of-N at equal NFE? Runs both
# selection-verifier regimes on the trained shapes32 artifact:
#   confidence (saturating) -> docs/results/restart_search.json
#   target-class (ranking)  -> docs/results/restart_search_target.json
# See RESULTS.md "Does restart STACK with best-of-N?" (~45 min each on v5e-1).
set -e
cd "$(dirname "$0")/.."
python experiments/restart_search.py --seeds 10 --verifier confidence "$@"
python experiments/restart_search.py --seeds 10 --verifier target "$@"
