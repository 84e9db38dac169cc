#!/usr/bin/env bash
# Round-5 fourth measurement queue: serving batch arms BETWEEN the measured
# 64-peak and the 128 decline.  Motivated by r5c: the TRAINING per-sample
# curve peaked at bs=96 — between two measured-worse sizes (64 and 128) —
# so the serving curve's 64-vs-128 gap deserves the same interior probe.
# Same resumable run_arm contract as onchip_queue_r5{b,c}.sh; ends with a
# fresh bs=64 anchor so the comparison is same-session (the ±8% cross-
# session tunnel band makes old anchors untrustworthy at this granularity).
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

run_arm $EV/bench_bs96.jsonl  env BENCH_BATCH=96 python bench.py
run_arm $EV/bench_bs80.jsonl  env BENCH_BATCH=80 python bench.py
run_arm $EV/bench_bs64_anchor2.jsonl env BENCH_BATCH=64 python bench.py

echo "=== QUEUE R5D COMPLETE $(date +%H:%M:%S) ==="
