#!/usr/bin/env bash
# Full test gate, both tiers (VERDICT r2 #10: the slow tier must actually
# run somewhere).  Usage: scripts/ci.sh [default|slow|all]
set -euo pipefail
cd "$(dirname "$0")/.."
tier="${1:-all}"
export PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu
if [[ "$tier" == "default" || "$tier" == "all" ]]; then
    echo "=== default tier ==="
    python -m pytest tests/ -q
fi
if [[ "$tier" == "slow" || "$tier" == "all" ]]; then
    echo "=== slow tier (long convergence runs, full-Inception CPU compiles,"
    echo "    signal-delivery subprocess variants) ==="
    python -m pytest tests/ -q -m slow
fi
