#!/usr/bin/env bash
# Canonical EnergyNet training config (reference scripts/train_energy.sh).
# For ranking training add:
#   --agent_type energy_with_ranking --pretrained_score_model_path <ckpt>
#
# sampler_mode ode_adaptive matches the reference's actual integrator for
# online candidate generation: its script passes no --sampling_steps, so
# cond_ode_sampler runs scipy's ADAPTIVE RK45 (reference samplers.py:202-205)
# — our on-device RK45 twin, ~6x fewer score evals than the fixed Heun-500
# grid ("ode").
python -m genpose_tpu.runners.trainer \
  --data_path "${NOCS_DATASET_PATH:?set NOCS_DATASET_PATH}" \
  --log_dir EnergyNet \
  --agent_type energy \
  --sampler_mode ode_adaptive \
  --batch_size 192 \
  --eval_freq 1 \
  --n_epochs 200 \
  --seed 0 \
  --is_train true \
  "$@"
