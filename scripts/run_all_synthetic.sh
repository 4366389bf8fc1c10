#!/usr/bin/env bash
# Execute every experiment suite end-to-end on synthetic data through the
# real train.py/test.py CLIs with a reduced grid (1 seed, 2 epochs, tiny
# images), asserting each emits its 'Average performance (by N)' lines.
# Also runs both preprocessing pipelines against miniature raw trees.
#
# Usage: scripts/run_all_synthetic.sh [sandbox_dir] [out_json]
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SANDBOX="${1:-/tmp/mst_sweep}"
OUT="${2:-$REPO/scripts_e2e_results.json}"
PYTHONPATH="$REPO:${PYTHONPATH:-}" JAX_PLATFORMS="${JAX_PLATFORMS:-cpu}" \
  python -m mst_tpu.utils.scripts_e2e sweep --sandbox "$SANDBOX" --out "$OUT"
