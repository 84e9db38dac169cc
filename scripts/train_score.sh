#!/usr/bin/env bash
# Canonical ScoreNet training config (reference scripts/train_score.sh).
python -m genpose_tpu.runners.trainer \
  --data_path "${NOCS_DATASET_PATH:?set NOCS_DATASET_PATH}" \
  --log_dir ScoreNet \
  --agent_type score \
  --sampler_mode ode \
  --sampling_steps 500 \
  --eval_freq 1 \
  --n_epochs 1900 \
  --batch_size 192 \
  --percentage_data_for_train 1.0 \
  --percentage_data_for_test 1.0 \
  --percentage_data_for_val 1.0 \
  --seed 0 \
  --is_train true \
  "$@"
