#!/usr/bin/env bash
# Round-4 on-chip measurement queue (run SEQUENTIALLY on the real TPU
# tunnel; never two heavy jobs at once — they time each other out,
# CLAUDE.md).  Addresses VERDICT r3 #2/#4/#5/#6.
#
# After running: fold the results into BASELINE.md (round-4 section),
# README.md, and CLAUDE.md; keep PARITY.md's deviation list in sync.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p bench_evidence/onchip_r4
log() { echo "=== $* ==="; }

# 1) bs=1 latency attribution with MARGINAL chain timing (#6) — a plain
#    time_chain cannot resolve bs=1 (the ~48 ms per-dispatch envelope
#    swamps ~1 ms of compute; the first r4 attempt read negative stages)
log "profile_bs1 (marginal timing)"
python tools/profile_bs1.py | tee bench_evidence/onchip_r4/profile_bs1_marginal.jsonl

# 2) freeze-vs-args same-session A/B (#5): is the Heun-500 freeze null
#    result real or round-2-vs-round-3 harness drift?
log "freeze A/B: Heun-500"
BENCH_SAMPLER=ode python tools/bench_freeze_ab.py \
  | tee bench_evidence/onchip_r4/freeze_ab_ode500.jsonl
log "freeze A/B: adaptive RK45 (anchor against the r3 numbers)"
BENCH_SAMPLER=ode_adaptive python tools/bench_freeze_ab.py \
  | tee bench_evidence/onchip_r4/freeze_ab_rk45.jsonl

# 3) bf16-training decomposition sweep (#2): which encoder component loses
#    the rotation signal?  Arms are ADAPTIVE — run the combined arm first;
#    if it converges, bisect (BN-only, geometry-only); if it fails, the
#    bf16 SharedMLP matmuls themselves are the culprit (everything else
#    f32 already failed in r3 with f32 heads).  3k steps each, full size.
log "sweep arm A: bf16 + f32 BN + f32 geometry (+ f32 heads)"
TRAIN_DTYPE=bfloat16 HEAD_DTYPE=float32 BN_DTYPE=float32 GEOM_DTYPE=float32 \
  python tools/tpu_convergence_check.py \
  | tee bench_evidence/onchip_r4/sweep_bf16_bnf32_geomf32_headf32.log || true
log "sweep arm B: bf16 + f32 BN only"
TRAIN_DTYPE=bfloat16 BN_DTYPE=float32 \
  python tools/tpu_convergence_check.py \
  | tee bench_evidence/onchip_r4/sweep_bf16_bnf32.log || true
log "sweep arm C: bf16 + f32 geometry only"
TRAIN_DTYPE=bfloat16 GEOM_DTYPE=float32 \
  python tools/tpu_convergence_check.py \
  | tee bench_evidence/onchip_r4/sweep_bf16_geomf32.log || true

# 4) train-step speed of whichever arm converged (supported-config number)
log "profile_train for the winning sweep arm (edit env to match)"
TRAIN_DTYPE=bfloat16 BN_DTYPE=float32 GEOM_DTYPE=float32 HEAD_DTYPE=float32 \
  GATHER_GRAD=fast GATHER_FWD=fast python tools/profile_train.py \
  | tee bench_evidence/onchip_r4/profile_train_winner.jsonl

# 5) end-to-end trainer throughput (#4): loader + process_batch +
#    train_step overlapped, vs the loader-only / step-only / serial rates
log "trainer e2e"
python tools/bench_trainer_e2e.py \
  | tee bench_evidence/onchip_r4/trainer_e2e.jsonl

# 6) headline sanity (the driver re-runs bench.py independently)
log "bench.py sanity"
python bench.py | tee bench_evidence/onchip_r4/bench_rk45.jsonl

log "queue complete — update BASELINE.md / README.md / CLAUDE.md / PARITY.md"
