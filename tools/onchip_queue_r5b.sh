#!/usr/bin/env bash
# Round-5 follow-up measurement queue (run AFTER onchip_queue_r5.sh drains;
# same resumable run_arm contract).  Motivated by the first queue's
# results: bs=384 is 14% WORSE per-sample than bs=192 (1750 vs 2027
# samples/s at E2), the same past-the-knee pattern serving showed above
# bs=64 — so probe BELOW the reference batch too (serving's per-pose peak
# sat at a small batch; if bs=96 is faster per-sample it is a real
# training-throughput lever since epochs shrink with updates/sample fixed).
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

run_arm $EV/profile_train_e2_bs96.jsonl \
  env TRAIN_DTYPE=bfloat16 F32_STAGES=-2 GATHER_GRAD=fast GATHER_FWD=fast \
  TRAIN_BATCH=96 python tools/profile_train.py

# Criterion re-runs with the compile-excluded wall clock (the first pass's
# f32/E2 walls were incomparable: f32's program was session-cached while
# E2 paid a fresh ~200 s server-side compile inside train_wall; the tool
# now excludes the first step).  Both programs are now cached, so these
# re-runs measure pure steady-state training wall.
run_arm $EV/criterion_f32_v2.log \
  env GATHER_GRAD=fast GATHER_FWD=fast EVAL_EVERY=500 N_STEPS=9000 \
  python tools/tpu_convergence_check.py
run_arm $EV/criterion_e2_v2.log \
  env TRAIN_DTYPE=bfloat16 F32_STAGES=-2 GATHER_GRAD=fast GATHER_FWD=fast \
  EVAL_EVERY=500 N_STEPS=9000 python tools/tpu_convergence_check.py
# The -1 first pass used the compile-excluded tool but ran during visible
# tunnel degradation (632 samples/s where E2 — a strictly SLOWER config per
# step — read 577 with a 200 s compile inside its wall); re-run for a wall
# comparable with the two arms above.
run_arm $EV/criterion_f32last1_v2.log \
  env TRAIN_DTYPE=bfloat16 F32_STAGES=-1 GATHER_GRAD=fast GATHER_FWD=fast \
  EVAL_EVERY=500 N_STEPS=9000 python tools/tpu_convergence_check.py

echo "=== QUEUE R5B COMPLETE $(date +%H:%M:%S) ==="
