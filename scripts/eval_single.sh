#!/usr/bin/env bash
# Canonical single-frame NOCS evaluation (reference scripts/eval_single.sh):
# K=50 PF-ODE hypotheses, T0=0.55, energy ranking, average pooling.
# NOTE: the reference passes --sampler_mode ode, but its 'ode'
# sampler ALWAYS integrates adaptively (scipy solve_ivp RK45 at
# atol/rtol 1e-5; --sampling_steps only subsamples the output).
# Here 'ode' means fixed-step Heun, so the faithful equivalent
# of the released eval is ode_adaptive.
python -m genpose_tpu.runners.evaluation_single \
  --score_model_dir ScoreNet/ckpt_genpose \
  --energy_model_dir EnergyNet/ckpt_genpose \
  --data_path "${NOCS_DATASET_PATH:?set NOCS_DATASET_PATH}" \
  --sampler_mode ode_adaptive \
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
