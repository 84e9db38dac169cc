#!/usr/bin/env bash
# Canonical single-frame NOCS evaluation (reference scripts/eval_single.sh):
# K=50 PF-ODE hypotheses, T0=0.55, energy ranking, average pooling.
python -m genpose_tpu.runners.evaluation_single \
  --score_model_dir ScoreNet/ckpt_genpose \
  --energy_model_dir EnergyNet/ckpt_genpose \
  --data_path "${NOCS_DATASET_PATH:?set NOCS_DATASET_PATH}" \
  --sampler_mode ode \
  --max_eval_num 1000000 \
  --batch_size 256 \
  --seed 0 \
  --test_source real_test \
  --result_dir results \
  --eval_repeat_num 50 \
  --pooling_mode average \
  --ranker energy_ranker \
  --T0 0.55 \
  "$@"
