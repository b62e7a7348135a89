#!/usr/bin/env bash
# Round-3 session-4 chip plan: run after the axon tunnel recovers.
# Order matters: parity gates first (a MISMATCH invalidates every bench of
# that kernel and flips its default off), then the pipeline-decisive A/Bs.
# Serialize — two processes sharing the chip OOM each other (PERF.md).
set -x
cd "$(dirname "$0")/.."

# 1. TPU parity gates for every session-4 kernel (small programs).
python scripts/perf_lab.py v5_check v5_check_projin v5_check_576 v5_check_gn \
    temporal_ln_check temporal_ffin_check cross_ff_check temporal_4d_check out4d_check \
    2>&1 | tee /tmp/chip_parity.log

# 2. unet_fwd with the full session-4 default stack, then the kill-switch
#    ladder (each knob isolates one change; nov5_nopacked reproduces the
#    0d71f72 graph = cache hit = sanity anchor ~1737 ms).
python scripts/perf_lab.py unet_fwd unet_fwd_nov5 unet_fwd_noprojin \
    unet_fwd_notemporalln unet_fwd_noffin unet_fwd_nocrossff unet_fwd_nov5gn \
    unet_fwd_xlapad unet_fwd_nov5_nopacked 2>&1 | tee /tmp/chip_ab.log

# 2b. Opt-in 4D transposed-IO stack (flip default if it wins):
python scripts/perf_lab.py unet_fwd_4d 2>&1 | tee -a /tmp/chip_ab.log

# 3. Isolated v5 rates (informational).
python scripts/perf_lab.py v5_320 v5_640 v5p_320 2>&1 | tee /tmp/chip_v5.log

# 4. The decision-grade metric: full pipeline bench with current defaults.
python bench.py 2>&1 | tee /tmp/chip_bench.log

# 5. If (4) regresses vs 1.796 s/step: disable the biggest suspect via env
#    and rerun, e.g.:
#    TVI_DISABLE_ATTN_V5=1 python bench.py
#    TVI_DISABLE_CROSS_FF=1 python bench.py
#    TVI_DISABLE_TEMPORAL_FFIN=1 python bench.py
#    TVI_DISABLE_TEMPORAL_LN=1 python bench.py
#    then flip the confirmed losers to opt-in in code and re-bench.

# 6. Full-size train-step probe (the session-4 kernels changed the
#    backward graph: chunked-reference VJPs for v5/ffin/cross+FF) — verify
#    the 512x320x14f batch-2 AdamW step still fits and time it.
timeout 3000 python scripts/train_step_probe.py 2>&1 | tee /tmp/chip_train.log

# Known contingencies:
# - If v5 fails to COMPILE on Mosaic, the likely culprit is the dynamic
#   scratch read `xp_ref[pl.ds(i*block_q, ...)]` in the projin variant.
#   Fix: stream the raw-x q-block as a third operand with BlockSpec
#   ((1, block_q, c_in), (bi, i, 0)) and recompute xp per block (~1 ms
#   extra proj FLOPs), or flip TVI_DISABLE_V5_PROJIN.
# - If the 4D kernels fail, the culprit is the in-VMEM (F, bp) swapaxes;
#   they are opt-in — leave TVI_TEMPORAL_4D unset.
