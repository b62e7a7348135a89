#!/usr/bin/env bash
# Launcher parity with reference src/train.sh: 512x320, 14 frames,
# per-device batch 2, 50k steps, ckpt every 50, validation every 1000.
# Topology comes from the mesh (all local devices) instead of
# `accelerate launch --config_file acc_N.yaml`.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m tvi.train.train_interp \
  --data_root "${DATA_ROOT:-TrainData}" \
  --output_dir "${OUTPUT_DIR:-outputs/train_interp}" \
  --width 512 --height 320 --sample_n_frames 14 \
  --per_gpu_batch_size 2 --max_train_steps 50000 \
  --learning_rate 1e-4 --checkpointing_steps 50 --validation_steps 1000 \
  "$@"
