#!/usr/bin/env bash
# Launcher parity with reference src/test_base.sh: run the eval sweep over
# ./assets folders with the base (no-track) setting.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m tvi.apps.test_sweep \
  --assets "${ASSETS:-./assets}" \
  --output_dir "${OUTPUT_DIR:-Result/base}" \
  --with_no_track --without_controlnet \
  "$@"
