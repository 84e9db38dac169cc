#!/usr/bin/env bash
# Round-5 on-chip measurement queue (run SEQUENTIALLY on the real TPU
# tunnel; never two heavy jobs at once — they time each other out,
# CLAUDE.md).  Addresses VERDICT r4 #3 (bs<64 serving arm), #4 (train-step
# batch scaling at the supported E2 config), #5 (wall-clock-to-criterion
# for the -1 encoder config), #7 (fused FPS+ball-query A/B).
#
# RESUMABLE: each arm writes to <out>.tmp and renames on success; arms
# whose output file already exists are skipped, so the queue can be
# relaunched after a tunnel outage without repeating finished work.
# Each arm retries up to 3 times with a 180 s backoff (the 13:29 outage
# that killed the first launch lasted a few minutes).
#
# After running: fold the results into BASELINE.md (round-5 section),
# README.md, and CLAUDE.md; land evidence under bench_evidence/onchip_r5/.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p bench_evidence/onchip_r5

run_arm() {  # run_arm <outfile> <cmd...>
  local out="$1"; shift
  if [ -s "$out" ]; then
    echo "=== SKIP $out (already present) ==="
    return 0
  fi
  local attempt
  for attempt in 1 2 3; do
    echo "=== RUN $out (attempt $attempt, $(date +%H:%M:%S)) ==="
    if "$@" >"$out.tmp" 2>&1; then
      mv "$out.tmp" "$out"
      tail -3 "$out"
      return 0
    fi
    echo "--- arm failed (attempt $attempt); last lines:"
    tail -5 "$out.tmp" || true
    sleep 180
  done
  echo "!!! GIVING UP on $out after 3 attempts"
  mv "$out.tmp" "$out.failed" 2>/dev/null || true
  return 0  # keep the queue going
}

EV=bench_evidence/onchip_r5

# 1) serving batch-size scaling BELOW the bs=64 peak (#3).  bs=32 landed
#    in the first launch (4195.43 poses/s); bs=48 + same-session bs=64
#    anchor remain.  Marginal-chain timing (bench.py default since r4).
run_arm $EV/bench_bs48.jsonl        env BENCH_BATCH=48 python bench.py
run_arm $EV/bench_bs64_anchor.jsonl python bench.py

# 2) fused FPS+ball-query Pallas kernel A/B (#7) — adoption gated on
#    >=10% on the geometry block (BASELINE r3 attribution predicts the
#    honest win is mostly the ~10-15% distance share of BQ).
run_arm $EV/fused_geometry_ab.jsonl python tools/bench_fused_geometry.py

# 3) train-step batch scaling at the SUPPORTED mixed config (#4):
#    E2 = bf16 + encoder_f32_stages -2 + fast gathers (BASELINE.md r4).
run_arm $EV/profile_train_e2_bs192.jsonl \
  env TRAIN_DTYPE=bfloat16 F32_STAGES=-2 GATHER_GRAD=fast GATHER_FWD=fast \
  python tools/profile_train.py
run_arm $EV/profile_train_e2_bs384.jsonl \
  env TRAIN_DTYPE=bfloat16 F32_STAGES=-2 GATHER_GRAD=fast GATHER_FWD=fast \
  TRAIN_BATCH=384 python tools/profile_train.py
run_arm $EV/profile_train_e2_bs768.jsonl \
  env TRAIN_DTYPE=bfloat16 F32_STAGES=-2 GATHER_GRAD=fast GATHER_FWD=fast \
  TRAIN_BATCH=768 python tools/profile_train.py

# 4) wall-clock-to-criterion for f32 / E2 / -1 (#5): rot<41deg AND
#    trans<3.9cm, checked every 500 steps, 9000-step cap (the -1 config
#    needed ~6k steps in r4).  Same task, same bs=64, same lr.
run_arm $EV/criterion_f32.log \
  env GATHER_GRAD=fast GATHER_FWD=fast EVAL_EVERY=500 N_STEPS=9000 \
  python tools/tpu_convergence_check.py
run_arm $EV/criterion_e2.log \
  env TRAIN_DTYPE=bfloat16 F32_STAGES=-2 GATHER_GRAD=fast GATHER_FWD=fast \
  EVAL_EVERY=500 N_STEPS=9000 python tools/tpu_convergence_check.py
run_arm $EV/criterion_f32last1.log \
  env TRAIN_DTYPE=bfloat16 F32_STAGES=-1 GATHER_GRAD=fast GATHER_FWD=fast \
  EVAL_EVERY=500 N_STEPS=9000 python tools/tpu_convergence_check.py

# 5) headline sanity (the driver re-runs bench.py independently)
run_arm $EV/bench_rk45.jsonl python bench.py

echo "=== QUEUE COMPLETE $(date +%H:%M:%S) ==="
