#!/usr/bin/env bash
# Canonical EnergyNet training config (reference scripts/train_energy.sh).
# For ranking training add:
#   --agent_type energy_with_ranking --pretrained_score_model_path <ckpt>
python -m genpose_tpu.runners.trainer \
  --data_path "${NOCS_DATASET_PATH:?set NOCS_DATASET_PATH}" \
  --log_dir EnergyNet \
  --agent_type energy \
  --sampler_mode ode \
  --batch_size 192 \
  --eval_freq 1 \
  --n_epochs 200 \
  --seed 0 \
  --is_train true \
  "$@"
