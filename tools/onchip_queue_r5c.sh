#!/usr/bin/env bash
# Round-5 third measurement queue (run AFTER onchip_queue_r5b.sh drains;
# same resumable run_arm contract).  Motivated by r5b's results:
#   * bs=96 E2 is 2,186 samples/s vs 2,027 at the reference's bs=192
#     (+7.8% per-sample) -> gate its promotion on a wall-to-criterion arm
#     at TRAIN_BATCH=96 (same lr; convergence there is bracketed by the
#     converging bs=64 criterion runs and the r4 bs=192 sweep).
#   * The per-sample peak may sit elsewhere below 192: localize it with
#     cheap profile arms at bs=64 and bs=128.
#   * E2-vs-f32 at a given batch depends on the geometry fraction (E2 buys
#     nothing at bs=64 per the v2 criterion arms): one f32 bs=96 profile
#     arm tells whether the bs=96 recipe should even be mixed-precision.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p bench_evidence/onchip_r5

run_arm() {
  local out="$1"; shift
  if [ -s "$out" ]; then echo "=== SKIP $out ==="; return 0; fi
  local attempt
  for attempt in 1 2 3; do
    echo "=== RUN $out (attempt $attempt, $(date +%H:%M:%S)) ==="
    if "$@" >"$out.tmp" 2>&1; then mv "$out.tmp" "$out"; tail -3 "$out"; return 0; fi
    echo "--- arm failed (attempt $attempt)"; tail -5 "$out.tmp" || true
    sleep 180
  done
  mv "$out.tmp" "$out.failed" 2>/dev/null || true
  return 0
}

EV=bench_evidence/onchip_r5

# Localize the per-sample training peak below the reference batch.
run_arm $EV/profile_train_e2_bs64.jsonl \
  env TRAIN_DTYPE=bfloat16 F32_STAGES=-2 GATHER_GRAD=fast GATHER_FWD=fast \
  TRAIN_BATCH=64 python tools/profile_train.py
run_arm $EV/profile_train_e2_bs128.jsonl \
  env TRAIN_DTYPE=bfloat16 F32_STAGES=-2 GATHER_GRAD=fast GATHER_FWD=fast \
  TRAIN_BATCH=128 python tools/profile_train.py

# Is mixed precision still a win at bs=96, or is the small-batch step
# geometry-bound like the bs=64 criterion arms showed?
run_arm $EV/profile_train_f32_bs96.jsonl \
  env GATHER_GRAD=fast GATHER_FWD=fast TRAIN_BATCH=96 \
  python tools/profile_train.py

# Promote-gate for the bs=96 recipe: wall-to-criterion at TRAIN_BATCH=96,
# directly comparable with criterion_{f32,e2,f32last1}_v2 (same tool, same
# compile-excluded wall, same session ordering discipline).
run_arm $EV/criterion_e2_bs96.log \
  env TRAIN_DTYPE=bfloat16 F32_STAGES=-2 GATHER_GRAD=fast GATHER_FWD=fast \
  TRAIN_BATCH=96 EVAL_EVERY=500 N_STEPS=9000 \
  python tools/tpu_convergence_check.py

echo "=== QUEUE R5C COMPLETE $(date +%H:%M:%S) ==="
