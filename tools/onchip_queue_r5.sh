#!/usr/bin/env bash
# Round-5 on-chip measurement queue (run SEQUENTIALLY on the real TPU
# tunnel; never two heavy jobs at once — they time each other out,
# CLAUDE.md).  Addresses VERDICT r4 #3 (bs<64 serving arm), #4 (train-step
# batch scaling at the supported E2 config), #5 (wall-clock-to-criterion
# for the -1 encoder config).
#
# After running: fold the results into BASELINE.md (round-5 section),
# README.md, and CLAUDE.md; land evidence under bench_evidence/onchip_r5/.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p bench_evidence/onchip_r5
log() { echo "=== $* ==="; }

# 1) serving batch-size scaling BELOW the bs=64 peak (#3) — the r4 bs=32
#    arm hit a 30-min timeout mid-compile; we run it with no such cap.
#    Marginal-chain timing (bench.py default since r4).
log "bench bs=32"
BENCH_BATCH=32 python bench.py | tee bench_evidence/onchip_r5/bench_bs32.jsonl
log "bench bs=48"
BENCH_BATCH=48 python bench.py | tee bench_evidence/onchip_r5/bench_bs48.jsonl
log "bench bs=64 (same-session anchor)"
python bench.py | tee bench_evidence/onchip_r5/bench_bs64_anchor.jsonl

# 2) train-step batch scaling at the SUPPORTED mixed config (#4):
#    E2 = bf16 + encoder_f32_stages -2 + fast gathers (BASELINE.md r4).
E2="TRAIN_DTYPE=bfloat16 F32_STAGES=-2 GATHER_GRAD=fast GATHER_FWD=fast"
log "profile_train E2 bs=192 (anchor)"
env TRAIN_DTYPE=bfloat16 F32_STAGES=-2 GATHER_GRAD=fast GATHER_FWD=fast \
  python tools/profile_train.py \
  | tee bench_evidence/onchip_r5/profile_train_e2_bs192.jsonl
log "profile_train E2 bs=384"
env TRAIN_DTYPE=bfloat16 F32_STAGES=-2 GATHER_GRAD=fast GATHER_FWD=fast \
  TRAIN_BATCH=384 python tools/profile_train.py \
  | tee bench_evidence/onchip_r5/profile_train_e2_bs384.jsonl
log "profile_train E2 bs=768"
env TRAIN_DTYPE=bfloat16 F32_STAGES=-2 GATHER_GRAD=fast GATHER_FWD=fast \
  TRAIN_BATCH=768 python tools/profile_train.py \
  | tee bench_evidence/onchip_r5/profile_train_e2_bs768.jsonl

# 3) wall-clock-to-criterion for f32 / E2 / -1 (#5): rot<41deg AND
#    trans<3.9cm, checked every 500 steps, 9000-step cap (the -1 config
#    needed ~6k steps in r4).  Same task, same bs=64, same lr.
log "criterion run: f32 (fast gathers — the supported f32 default)"
env GATHER_GRAD=fast GATHER_FWD=fast EVAL_EVERY=500 N_STEPS=9000 \
  python tools/tpu_convergence_check.py \
  | tee bench_evidence/onchip_r5/criterion_f32.log
log "criterion run: E2 (bf16 + f32 last two stages)"
env TRAIN_DTYPE=bfloat16 F32_STAGES=-2 GATHER_GRAD=fast GATHER_FWD=fast \
  EVAL_EVERY=500 N_STEPS=9000 python tools/tpu_convergence_check.py \
  | tee bench_evidence/onchip_r5/criterion_e2.log
log "criterion run: -1 (bf16 + f32 GroupAll only — experimental)"
env TRAIN_DTYPE=bfloat16 F32_STAGES=-1 GATHER_GRAD=fast GATHER_FWD=fast \
  EVAL_EVERY=500 N_STEPS=9000 python tools/tpu_convergence_check.py \
  | tee bench_evidence/onchip_r5/criterion_f32last1.log

# 4) headline sanity (the driver re-runs bench.py independently)
log "bench.py headline sanity"
python bench.py | tee bench_evidence/onchip_r5/bench_rk45.jsonl
