#!/usr/bin/env bash
# Round-5 Winograd F(2x2,3x3) isolated conv A/B (PERF.md round-5 queue #2).
#
# Prototype lives in scripts/perf_lab.py (winograd group): XLA-level
# F(2x2,3x3) with pre-transformed weights, correctness-gated vs lax conv
# (winograd_check, 3.4e-7 rel err fp32).  This ladder measures it against
# the direct-conv ceiling probes at the three conv bucket shapes.  Report
# numbers are EFFECTIVE TF/s vs the direct 9-tap FLOP count, so wg_* vs
# conv_* compare head-to-head; winograd's actual MACs are 2.25x fewer.
#
# Decision rule (in-context-inversion law): wg_X must beat conv_X by >25%
# ISOLATED before any model wiring is even considered — the XLA
# formulation materializes a 4x-input-bytes transformed-tile tensor, so a
# loss here closes the family (traffic-bound at ~0.5 TB/s); a win routes
# to a Pallas in-VMEM transform mega-kernel next.
#
# Serialized on the single chip; run only when no other chip job is live:
#   nohup ./scripts/r5_winograd_plan.sh > /tmp/r5_winograd.log 2>&1 &
#   echo $! > /tmp/wgplan.pid
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  local tag="$1"; shift
  echo "=== [$tag] $* ==="
  # capture FULL output per stage (CLAUDE.md: piping TPU runs through tail
  # loses partial output/tracebacks if a late stage fails — ADVICE r4),
  # then echo the result lines into the main log.
  timeout 1800 python scripts/perf_lab.py "$@" > "/tmp/r5_${tag}.log" 2>&1
  local rc=$?
  tail -6 "/tmp/r5_${tag}.log"
  echo "=== [$tag] done rc=$rc (full log /tmp/r5_${tag}.log) ==="
}

# Phase 1: the Pallas row-Winograd kernel (tvi/ops/pallas_winograd.py,
# 1.5x MAC cut, same structure as pconv3 k3).  Parity gate FIRST (real
# Mosaic path; interpret-mode tests are green on CPU), then A/B vs the
# direct kernels + XLA at each bucket shape.
run row_check wg_row_check
run row_up3 conv_up3 pconv3_up3_k3 wg_row_up3 wg_row_up3_bh32
run row_up2 conv_up2 pconv3_up2_k3 wg_row_up2
run row_unet320 conv_unet320 wg_row_unet320
run row_gn pconv3_up3_k9_gn wg_row_up3_gn

# Phase 2 (only if phase 1 wins nowhere): the XLA-level F(2x2,3x3)
# formulation — expected traffic-bound (4x-input-bytes transformed tiles)
# but closes the family with a measurement if so.
run check winograd_check
run up3 wg_up3 wg_up3_loop
run up2 wg_up2
run unet320 wg_unet320
