#!/usr/bin/env bash
# REAL275 measured-accuracy parity runbook — the ONE command that closes
# BASELINE.md's north star (REAL275 5deg2cm / 5deg5cm mAP within 0.5 pts of
# the reference checkpoints) once the released artifacts are present.
#
# This image has zero egress, no NOCS images, and no released .pth
# checkpoints (/root/reference/data holds only Real/train/mug_handle.pkl),
# so the measurement itself is blocked HERE — but every stage below is
# already parity-tested in-tree: the checkpoint port round-trips with
# forward parity (tests/test_reference_parity.py::test_port_torch_ckpt_
# roundtrip), the composed eval pipeline is golden-tested against the
# reference's OWN runner at two protocol points
# (tests/test_composed_pipeline.py), and compute_mAP is bit-parity-tested.
#
# On a machine WITH the released artifacts (reference README.md:99-131 —
# the Google Drive folder it links), lay them out as the reference expects:
#
#   results/ckpts/ScoreNet/ckpt_genpose.pth
#   results/ckpts/EnergyNet/ckpt_genpose.pth
#   results/evaluation_results/segmentation_results_real_test.pkl
#
# then from the repo root:  bash tools/real275_parity_runbook.sh
#
# Stages: port both .pth checkpoints (orbax dirs under results/ckpts/) ->
# run the canonical single-frame eval (K=50, adaptive PF-ODE, T0=0.55,
# energy_ranker, average pooling, keep-ratio 0.6 — the released
# scripts/eval_single.sh protocol) off the released segmentation pkl ->
# compare the mean-class mAP row against the paper's (approx
# 52.1/60.9/72.4/84.0 at 5d2cm/5d5cm/10d2cm/10d5cm, arXiv:2306.10531 —
# externally recalled, re-verify against the paper; the repo itself
# publishes no numbers).
set -euo pipefail
cd "$(dirname "$0")/.."

SCORE_PTH="results/ckpts/ScoreNet/ckpt_genpose.pth"
ENERGY_PTH="results/ckpts/EnergyNet/ckpt_genpose.pth"
SEG_PKL="results/evaluation_results/segmentation_results_real_test.pkl"

missing=0
for f in "$SCORE_PTH" "$ENERGY_PTH" "$SEG_PKL"; do
  if [ ! -f "$f" ]; then echo "MISSING: $f"; missing=1; fi
done
if [ "$missing" = 1 ]; then
  cat <<'EOF'

Artifacts absent (expected in this zero-egress image).  Fetch the released
checkpoints + preprocessed REAL275 test data per the reference repo's
README "Download dataset and models" section (Google Drive folder linked
there), lay them out as above, and re-run.  Nothing else is required —
the port, eval, and metric stages below are all parity-tested in-tree.
EOF
  exit 2
fi

echo "=== stage 1/3: port torch checkpoints ==="
# evaluation_single resolves --{score,energy}_model_dir under results/ckpts/
# (the reference's convention), so the ported orbax dirs go there too.
python tools/port_torch_ckpt.py --input "$SCORE_PTH" \
  --output results/ckpts/ScoreNet/ckpt_genpose_ported --posenet_mode score
python tools/port_torch_ckpt.py --input "$ENERGY_PTH" \
  --output results/ckpts/EnergyNet/ckpt_genpose_ported --posenet_mode energy

echo "=== stage 2/3: single-frame eval (released protocol) ==="
# --result_dir results => the runner finds the released segmentation pkl at
# results/evaluation_results/segmentation_results_real_test.pkl and skips
# its own mrcnn-derived segmentation stage (evaluation_single.py:
# detect_mrcnn_results loads an existing pkl as-is).  The reference's 'ode'
# eval always integrates adaptively, so the faithful sampler here is
# ode_adaptive (see scripts/eval_single.sh note).
python -m genpose_tpu.runners.evaluation_single \
  --score_model_dir ScoreNet/ckpt_genpose_ported \
  --energy_model_dir EnergyNet/ckpt_genpose_ported \
  --data_path "${NOCS_DATASET_PATH:-results}" \
  --sampler_mode ode_adaptive \
  --max_eval_num 1000000 \
  --batch_size 256 \
  --seed 0 \
  --test_source real_test \
  --result_dir results \
  --eval_repeat_num 50 \
  --pooling_mode average \
  --ranker energy_ranker \
  --T0 0.55

echo "=== stage 3/3: parity check vs paper row ==="
python - results/evaluation_results/real_test_repeat_50/mAP_headline.json <<'EOF'
import json, sys
ours = json.load(open(sys.argv[1]))  # percent, mean class (runner-written)
paper = {"5d2cm": 52.1, "5d5cm": 60.9, "10d2cm": 72.4, "10d5cm": 84.0}
print(f"{'metric':>8} {'ours':>7} {'paper~':>7} {'delta':>7}")
worst = 0.0
for k, p in paper.items():
    delta = ours[k] - p
    if k in ("5d2cm", "5d5cm"):
        worst = max(worst, abs(delta))
    print(f"{k:>8} {ours[k]:7.1f} {p:7.1f} {delta:+7.1f}")
print("NORTH STAR:", "PASS (within 0.5 pts at 5d2cm/5d5cm)" if worst <= 0.5
      else f"CHECK (worst 5-degree delta {worst:.1f} pts; the paper row is "
      "externally recalled — verify against arXiv:2306.10531 table 1)")
EOF
