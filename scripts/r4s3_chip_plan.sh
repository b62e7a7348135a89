#!/usr/bin/env bash
# Round-4 session-3 chip plan (runbook — execute steps manually, ONE TPU
# process at a time; two processes sharing the chip OOM each other).
#
# Pre-state: bench.py (default stack) ran first thing this session to warm
# /tmp/tvi_jax_cache_tpu and record the headline.  CPU suite + dryrun warm
# /tmp/tvi_jax_cache in parallel.
#
# 1. Re-gate the fixed transposed-IO kernels (round-4 failures addressed in
#    code: VMEM-aware block_r for temporal_4d; tile-aligned reshapes for
#    out4d):
#      timeout 3000 python scripts/perf_lab.py temporal_4d_check out4d_check \
#        2>&1 | tee /tmp/r4s3_4dgates.log
#    Both must print OK (rel err <= 5%).  On a Mosaic failure: record in
#    PERF.md/PARITY.md and stop the 4D track (kernels stay opt-in).
#
# 2. Re-verify the full-size train step after the v5 default flip (VERDICT
#    r3 item 6; the flip changed the backward graph — v5 VJP left the path):
#      timeout 3000 python scripts/train_step_probe.py 2>&1 \
#        | tee /tmp/r4s3_trainprobe.log
#    Record s/step + HBM in PERF.md; must still fit 15.75 GB at the
#    512x320x14f batch-2 geometry.
#
# 3. unet_fwd A/B ladder for the 4D stack (only if step 1 passed):
#      timeout 3000 python scripts/perf_lab.py unet_fwd 2>&1 | tee -a /tmp/r4s3_ab.log
#      timeout 3000 python scripts/perf_lab.py unet_fwd_4d_in 2>&1 | tee -a /tmp/r4s3_ab.log
#      timeout 3000 python scripts/perf_lab.py unet_fwd_4d 2>&1 | tee -a /tmp/r4s3_ab.log
#    Decision rule (PERF.md): unet_fwd isolates; a default flip additionally
#    needs a full-pipeline bench win.
#
# 4. If unet_fwd_4d (or _4d_in) wins by > ~25 ms: ONE full-pipeline A/B
#      env TVI_TEMPORAL_4D=1 [TVI_TEMPORAL_OUT4D=0] python bench.py 2>&1 \
#        | tee /tmp/r4s3_bench_4d.log
#    Flip the default in code only on a pipeline win; then re-run a no-env
#    `python bench.py` (cache hit) to confirm and leave the cache warm for
#    the driver.
#
# 5. Optional decode chunk probe (decode 2.136 s at chunk 10; 4.8% of total):
#      TVI_BENCH_DECODE_CHUNK=12 python bench.py   # only if time allows
#
# 6. End-of-session cache warming for the driver artifacts (VERDICT r3 #2):
#      python bench.py                              # TPU cache, final defaults
#      env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
#        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
#        python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
set -x
echo "runbook — execute manually"
