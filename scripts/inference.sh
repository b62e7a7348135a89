#!/usr/bin/env bash
# Reconstruction of the reference's 0-byte inference.sh: single-pair
# inference via the eval sweep CLI.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m tvi.apps.test_sweep --assets "${ASSETS:-./assets}" \
  --output_dir "${OUTPUT_DIR:-outputs/inference}" "$@"
