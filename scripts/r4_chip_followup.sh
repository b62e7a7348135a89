#!/usr/bin/env bash
# Round-4 follow-up to scripts/r3s4_chip_plan.sh — run AFTER the ladder
# completes.  Early ladder data (14:30-14:46): the full session-4 default
# stack unet_fwd = 1948.8 ms vs 1712.9 ms with TVI_DISABLE_ATTN_V5=1, so at
# least the v5 fold is a large on-chip LOSER despite passing parity.
#
# Decision rule (PERF.md): unet_fwd isolates candidates; only a FULL
# pipeline bench.py A/B is decision-grade for default flips (flat-F won
# unet_fwd by -51 ms yet lost the pipeline by +67 ms in round 3).
#
# Procedure:
#   1. Read /tmp/chip_ab.log; mark every knob whose disable-run is faster
#      than the default-stack run as a candidate loser.
#   2. The chip plan's step 4 already benched the CURRENT defaults
#      (/tmp/chip_bench.log).  Run ONE more full bench with every candidate
#      loser disabled (env only — same traced graph as a code flip):
#        env <LOSER_KNOBS> python bench.py 2>&1 | tee /tmp/r4_bench_flipped.log
#   3. If the flipped bench wins: flip the same defaults in code
#      (tvi/ops/*.py env-default reads), confirm `python bench.py` (no env)
#      is a CACHE HIT reproducing the flipped number, update PERF.md/PARITY
#      rows with the measured deltas.
#   4. Cache warming for the driver (VERDICT r3 item 2):
#        python bench.py                       # warms /tmp/tvi_jax_cache_tpu
#        env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
#          XLA_FLAGS=--xla_force_host_platform_device_count=8 \
#          python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
#                                              # warms /tmp/tvi_jax_cache
#   5. Train-step probe already ran as chip-plan step 6; if the flips change
#      the backward graph (they do: v5 VJP leaves the path), rerun:
#        timeout 3000 python scripts/train_step_probe.py
#
# Keep the chip serialized: never two TPU processes at once.
set -x
cd "$(dirname "$0")/.."
echo "This script is a runbook; execute the steps manually with the" \
     "knob set derived from /tmp/chip_ab.log."
