#!/usr/bin/env bash
# Round-4 session-8 training-step decomposition + VJP-chunk A/B ladder.
# Serialized on the single chip (two processes sharing it OOM each other —
# PERF.md r3 s4).  Run AFTER the pipeline bench frees the chip:
#   nohup ./scripts/r4s8_train_plan.sh > /tmp/r4s8_train_plan.log 2>&1 &
#
# Phase 1 — decomposition: where do the 2.50 s/step go?  TVI_ABLATE is a
# trace-time knob (read in flax __call__), so each variant is its own
# process + program.
# Phase 2 — actionable A/Bs: bigger VJP chunks (1.3 GB HBM headroom at the
# 14.41/15.75 GB footprint), and no-chunk upper bound if it fits.
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  local tag="$1"; shift
  echo "=== [$tag] env: $* ==="
  env "$@" timeout 1500 python scripts/train_step_probe.py 2>&1 \
    | grep -E "step|GB|loss|OOM|RESOURCE|Error" | tail -8
  echo "=== [$tag] done rc=$? ==="
}

# Phase 1: decomposition
run abl_transformers TVI_ABLATE=transformers
run abl_spatialattn TVI_ABLATE=spatial_attn
run abl_ff TVI_ABLATE=ff
run abl_temporalattn TVI_ABLATE=temporal_attn

# Phase 2: VJP chunk ladder (baseline 2.50 s / 14.41 GB, r4s3)
run vjp_bq1280 TVI_VJP_BLOCK_Q=1280
run vjp_nochunk TVI_VJP_BLOCK_Q=0 TVI_VJP_FF_TARGET=0
run vjp_ff32k TVI_VJP_FF_TARGET=32768
