#!/usr/bin/env bash
# Round-4 session-10 remat-policy ladder (phase 3 of the training-step
# grind; phases 1-2 = scripts/r4s8_train_plan.sh).
#
# TVI_REMAT_POLICY selects what the per-block nn.remat saves
# (tvi/models/unet_st.py::_remat_policy).  Baseline "full" = 2.50 s/step,
# 14.41/15.75 GB (r4s3) — ~1.3 GB headroom to spend on saved activations
# that skip backward recompute.  Convs are 52% of the step (r4s10 phase-1
# decomposition), so "convs"/"convs2" attack the dominant bucket; "dots"
# attacks transformer GEMM recompute.  Each variant is its own process
# (trace-time knob).  A variant that doesn't fit dies at compile with
# RESOURCE_EXHAUSTED — that is a result, record it.
#
# Serialized on the single chip: run only after /tmp/trainplan.pid exits.
#   nohup ./scripts/r4s10_remat_plan.sh > /tmp/r4s10_remat_plan.log 2>&1 &
#   echo $! > /tmp/rematplan.pid
set -uo pipefail
cd "$(dirname "$0")/.."

# timeout 2700: full-step (non-ablated) programs exceeded the r4s8 plan's
# 1500 s remote-AOT budget (vjp_bq1280 died rc=124 mid-compile).
run() {
  local tag="$1"; shift
  echo "=== [$tag] env: $* ==="
  # full output per stage (ADVICE r4: piping TPU runs through grep/tail
  # loses the traceback when a late stage dies)
  env "$@" timeout 2700 python scripts/train_step_probe.py \
    > "/tmp/r5_remat_${tag}.log" 2>&1
  local rc=$?
  grep -E "step|GB|loss|OOM|RESOURCE|Error" "/tmp/r5_remat_${tag}.log" | tail -8
  echo "=== [$tag] done rc=$rc (full log /tmp/r5_remat_${tag}.log) ==="
}

# same-container baseline: the 2.50 s / 14.41 GB reference was measured in
# an earlier container; tunnel latency differs per container (PERF.md r4s9
# decode variance), so every A/B below compares against THIS number.
run baseline TVI_NOOP=0
run vjp_bq1280_retry TVI_VJP_BLOCK_Q=1280
run remat_convs2 TVI_REMAT_POLICY=convs2
run remat_convs TVI_REMAT_POLICY=convs
run remat_dots TVI_REMAT_POLICY=dots
# VERDICT r5 item 2: re-judge the r4s10 phase-2 ff32k reading (2.42 s) vs
# THIS container's baseline — the original number was cross-container.
run vjp_ff32k TVI_VJP_FF_TARGET=32768
