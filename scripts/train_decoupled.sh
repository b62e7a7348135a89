#!/usr/bin/env bash
# Launcher parity with reference src/train_decouples.sh (decoupled trainer:
# motion encoder, monotonicity loss options).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m tvi.train.train_decoupled \
  --data_root "${DATA_ROOT:-TrainData}" \
  --output_dir "${OUTPUT_DIR:-outputs/train_decoupled}" \
  --width 512 --height 320 --sample_n_frames 14 \
  --per_gpu_batch_size 2 --max_train_steps 50000 \
  --checkpointing_steps 50 --validation_steps 1000 \
  "$@"
