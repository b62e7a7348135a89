#!/usr/bin/env bash
# Run the test suite on CPU with 8 virtual devices, skipping the axon TPU
# tunnel handshake (PALLAS_AXON_POOL_IPS= disables the sitecustomize
# register() call, saving ~60s of fixed startup per process).
set -euo pipefail
cd "$(dirname "$0")/.."
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q "$@"
