#!/usr/bin/env bash
# On-chip measurement queue (run SEQUENTIALLY on the real TPU tunnel; never
# two heavy jobs at once — they time each other out, CLAUDE.md).
#
# Context: round 3 found the frozen-pipeline numbers were inflated by a
# same-seed derandomization that let XLA CSE the duplicate energy encoder
# trunk (BASELINE.md r3 CORRECTION).  bench.py / profile_pipeline.py are
# fixed (distinct seeds); this queue re-measures everything the artifact
# touched, plus the pending two-dispatch geometry-sharing A/B.
#
# After running: replace the corrected numbers in BASELINE.md (and the
# README performance table), and update the CLAUDE.md stacked-encoder note
# with the honest A/B magnitude.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p results/onchip_r3
log() { echo "=== $* ==="; }

# 1) honest frozen-pipeline headline, 3x for the +-8% tunnel variance
for i in 1 2 3; do
  log "bench.py run $i (adaptive RK45, frozen, distinct seeds)"
  python bench.py | tee -a results/onchip_r3/bench_rk45.jsonl
done

# 2) fixed-step Heun headline (one run; secondary number)
log "bench.py Heun-500"
BENCH_SAMPLER=ode python bench.py | tee results/onchip_r3/bench_ode500.jsonl

# 3) stage attribution + whole-pipeline MFU + freeze A/B + stacked A/B,
#    now with distinct weights (the energy stage is REAL compute again)
log "profile_pipeline bs=64"
python tools/profile_pipeline.py | tee results/onchip_r3/profile_pipeline_bs64.jsonl

# 4) two-dispatch geometry-sharing A/B (production train_energy shape;
#    the fused program CSEs the duplicate geometry and cannot show this)
log "energy-train two-dispatch A/B: shared"
DISPATCH=two GEOM_SHARED=1 python tools/profile_energy_train.py \
  | tee results/onchip_r3/energy_two_dispatch_shared.jsonl
log "energy-train two-dispatch A/B: unshared"
DISPATCH=two GEOM_SHARED=0 python tools/profile_energy_train.py \
  | tee results/onchip_r3/energy_two_dispatch_unshared.jsonl

log "queue complete — update BASELINE.md / README.md / CLAUDE.md"
