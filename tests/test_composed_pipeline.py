"""Composed-pipeline golden test (VERDICT r2 'do this' #1).

Every component is golden-tested against the reference individually
(score/energy forward, encoder, integrator, ranking, ``compute_mAP``); this
test proves the COMPOSITION: the reference's own ``runners/evaluation_single``
stages 2-4 (``inference_pose`` -> ``inference_energy`` -> ``evaluate``,
``evaluation_single.py:356-544``) run on CPU torch via the bridge, on the
same segmentation pkl (produced once by OUR stage 1), with the same
randomized weights ported into the flax agents — and the final mAP tables
must match ours line for line.

Determinism: the additive prior draw is zeroed on both sides (the
reference's via its injectable ``prior_fn``, ours via a ``dataclasses.replace``
on the agent's SDE), T0=0.55, and both sides integrate the PF-ODE adaptively
(reference: scipy ``solve_ivp`` RK45 at atol/rtol 1e-5; ours:
``ode_sampler_adaptive`` — endpoint parity ~2e-7 proven in
``test_reference_parity.py``).  Residual differences (our batch padding
shares one adaptive step size across padded rows; the reference's
flipped-sign eps-denoise step, ``samplers.py:216``) are bounded well below
the 1-degree / 0.5-cm threshold grid, so the AP tables agree exactly.
"""

from __future__ import annotations

import importlib
import os
import pickle
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import _reference_bridge as rb

from genpose_tpu.config import get_config
from genpose_tpu.data.synthetic import (
    make_synthetic_mrcnn_results,
    make_synthetic_nocs_dir,
)
from genpose_tpu.runners import evaluation_single as ours

N_PTS = 64
IMG_SIZE = 8   # 8x8 crop <= N_PTS pixels: stage 1 hits the deterministic
               # tile-then-prefix sampling branch on BOTH sides (no random
               # permutation), so the seg pkls are directly comparable
K = 3
BS = 8
T0 = 0.55


# Fixed prior draws: both sides iterate categories/batches/instances in the
# same order off the same seg pkl and fold K instance-major, so row i of the
# prior aligns 1:1 across implementations (our batch padding only appends
# rows past n_real*K).  Nonzero so the K hypotheses are DISTINCT and the
# energy sort / pooling see real work.
_PRIOR = np.asarray(np.random.RandomState(9).randn(BS * K, 9), np.float32)
_prior_rows = rb.make_prior_rows(_PRIOR)


def _near_gt_results(with_energy_path):
    """Replace every instance's K hypotheses with progressively-noised GT
    poses (hypothesis k: rotate ~3k degrees about a fixed axis, shift 1.5k
    cm) and seeded random energies, so the pooling/ratio/ranking machinery
    in stage 4 produces AP values strictly inside (0, 100)."""
    with open(with_energy_path, "rb") as f:
        res = pickle.load(f)
    rng = np.random.RandomState(77)
    for entry in res.values():
        r = entry["result"]
        n, Kh = r["multi_hypothesis_pred_RTs"].shape[:2]
        for i in range(min(n, len(r["gt_RTs"]))):
            gt = np.asarray(r["gt_RTs"][i], float)
            for k in range(Kh):
                ang = np.deg2rad(3.0 * k)
                c, s = np.cos(ang), np.sin(ang)
                rot_y = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
                rt = gt.copy()
                rt[:3, :3] = rt[:3, :3] @ rot_y
                rt[:3, 3] += 0.015 * k * rng.randn(3)
                r["multi_hypothesis_pred_RTs"][i, k] = rt
        r["energy"] = rng.rand(*np.shape(r["energy"]))
    return res


@pytest.fixture(scope="module")
def composed(tmp_path_factory):
    root = tmp_path_factory.mktemp("composed")
    cwd = os.getcwd()
    os.chdir(root)
    patch = rb.Patcher()
    try:
        nocs = make_synthetic_nocs_dir(
            str(root / "nocs"), n_camera_scenes=1, n_real_scenes=2, seed=17)
        res_dir = str(root / "refres")
        make_synthetic_mrcnn_results(nocs, res_dir, "real_test")

        # ---- shared stage 1: OUR detection feeds BOTH pipelines ----
        our_cfg = get_config([
            "--data_path", nocs, "--result_dir", res_dir,
            "--test_source", "real_test", "--eval_repeat_num", str(K),
            "--batch_size", str(BS), "--num_points", str(N_PTS),
            "--img_size", str(IMG_SIZE),
            "--T0", str(T0), "--sampler_mode", "ode_adaptive",
            "--pooling_mode", "average", "--ranker", "energy_ranker",
        ])
        seg_root = os.path.join(res_dir, "evaluation_results")
        seg_path = os.path.join(
            seg_root, "segmentation_results_real_test.pkl")
        ours.detect_mrcnn_genpose(our_cfg, seg_path)

        # ---- import the reference runner with a matching module cfg ----
        rb.install_stubs()
        if rb.REF_ROOT not in sys.path:
            sys.path.insert(0, rb.REF_ROOT)
        rb.patch_runner_cuda(patch)

        argv = sys.argv
        sys.argv = [
            "genpose", "--test_source", "real_test", "--result_dir", res_dir,
            "--data_path", nocs,
            "--batch_size", str(BS), "--eval_repeat_num", str(K),
            "--num_points", str(N_PTS), "--img_size", str(IMG_SIZE),
            "--T0", str(T0),
            "--sampler_mode", "ode", "--device", "cpu",
            "--score_model_dir", "ref_score.pth",
            "--energy_model_dir", "ref_energy.pth",
            "--pooling_mode", "average", "--ranker", "energy_ranker",
        ]
        try:
            es = importlib.import_module("runners.evaluation_single")
        finally:
            sys.argv = argv

        # ---- shared randomized weights, saved as reference checkpoints ----
        tscore = rb.make_gf_net("score", 41, N_PTS)
        tenergy = rb.make_gf_net("energy", 43, N_PTS)
        os.makedirs("results/ckpts", exist_ok=True)
        torch.save({"model_state_dict": tscore.state_dict()},
                   "results/ckpts/ref_score.pth")
        torch.save({"model_state_dict": tenergy.state_dict()},
                   "results/ckpts/ref_energy.pth")

        # pin the reference's additive prior draw to the same fixed rows
        real_posenet = es.PoseNet

        def _det_posenet(cfg):
            agent = real_posenet(cfg)
            agent.net.prior_fn = lambda shape, T=None: torch.from_numpy(
                _prior_rows(shape[0]).copy())
            return agent

        patch(es, "PoseNet", _det_posenet)

        # ---- reference stage 1 on the same raw tree (deterministic
        # tiling regime) for seg-pkl parity against OUR stage 1 ----
        ref_seg_path = os.path.join(
            seg_root, "segmentation_results_ref_stage1.pkl")
        es.detect_mrcnn_genpose(ref_seg_path)

        # ---- run the reference's composed stages 2-4 ----
        es.inference_pose(seg_path, es.inference_res_dir, es.cfg.pose_mode,
                          record_process=False)
        es.inference_energy(es.inference_res_dir, es.cfg.pose_mode)
        es.evaluate(es.inference_res_dir, "results_with_energy.pkl")
        ref_dir = es.inference_res_dir

        # ---- run OUR composed stages 2-4 on the same seg pkl + weights ----
        our_dir = str(root / "ours_infer")
        score_agent = rb.ported_flax_agent(our_cfg, "score", tscore,
                                            _prior_rows)
        energy_agent = rb.ported_flax_agent(our_cfg, "energy", tenergy,
                                            _prior_rows)
        ours.inference_pose(our_cfg, score_agent, seg_path, our_dir)
        ours.inference_energy(our_cfg, energy_agent, our_dir)
        ours.evaluate(our_cfg, our_dir, "results_with_energy.pkl")

        # ---- second stage-4 pass on NEAR-GT hypotheses (same file both
        # sides): untrained nets give all-zero pose tables, which would
        # "match" vacuously — noised-GT hypotheses with seeded energies give
        # non-degenerate AP/Acc numbers that both evaluates must reproduce
        near = _near_gt_results(
            os.path.join(ref_dir, "results_with_energy.pkl"))
        for d in (ref_dir, our_dir):
            with open(os.path.join(d, "results_near_gt.pkl"), "wb") as f:
                pickle.dump(near, f)
        es.evaluate(ref_dir, "results_near_gt.pkl")
        ours.evaluate(our_cfg, our_dir, "results_near_gt.pkl")

        # ---- third stage-4 pass at a SECOND protocol point (VERDICT r3
        # #8): gt_ranker + nearest pooling + keep-ratio 0.3, on the same
        # near-GT hypotheses — exercises the other ranking/pooling branches
        # of ``sgpa_utils.py:897-954`` composed end-to-end.  The reference
        # hardcodes the ratio sweep as ``np.linspace(0.6, 0.6, 1)``
        # (``evaluation_single.py:534``); nothing else in its eval path
        # calls np.linspace, so shim that one call around the run.
        import dataclasses

        es.cfg.pooling_mode, es.cfg.ranker = "nearest", "gt_ranker"
        orig_linspace = np.linspace

        def _ratio_linspace(*a, **kw):
            if tuple(a[:3]) == (0.6, 0.6, 1):
                return orig_linspace(0.3, 0.3, 1)
            return orig_linspace(*a, **kw)

        np.linspace = _ratio_linspace
        try:
            es.evaluate(ref_dir, "results_near_gt.pkl")
        finally:
            np.linspace = orig_linspace
            es.cfg.pooling_mode, es.cfg.ranker = "average", "energy_ranker"
        cfg2 = dataclasses.replace(
            our_cfg, pooling_mode="nearest", ranker="gt_ranker",
            eval_ratios=(0.3,))
        ours.evaluate(cfg2, our_dir, "results_near_gt.pkl")

        yield {"ref_dir": ref_dir, "our_dir": our_dir, "cfg": our_cfg,
               "seg_path": seg_path, "ref_seg_path": ref_seg_path}
    finally:
        patch.restore()
        os.chdir(cwd)


def _load_results(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def test_composed_stage1_segmentation_parity(composed):
    """Stage 1 composition: the reference's ``detect_mrcnn_genpose``
    (``evaluation_single.py:105-260``) and ours, run on the same raw
    synthetic NOCS tree + mrcnn pkls, produce the same segmentation cache —
    valid-instance selection (depth/mask cutoffs), crop window (``get_bbox``
    40px snap), warp-affine coord/mask/depth maps, backprojection, and the
    tile-then-prefix point sampling (both sides deterministic at
    IMG_SIZE^2 <= num_points pixels)."""
    ref = _load_results(composed["ref_seg_path"])
    our = _load_results(composed["seg_path"])
    assert set(ref.keys()) == set(our.keys()) and len(ref) > 0
    n_insts = 0
    for img in ref:
        r, o = ref[img], our[img]
        assert list(r["valid_inst"]) == list(o["valid_inst"])
        assert list(r["cat_id"]) == list(o["cat_id"])
        assert len(r["valid_pts"]) == len(o["valid_pts"])
        for rp, op in zip(r["valid_pts"], o["valid_pts"]):
            assert np.asarray(rp).shape == (N_PTS, 3)
            np.testing.assert_allclose(np.asarray(op), np.asarray(rp),
                                       atol=1e-6)
            n_insts += 1
        for k in ("gt_class_ids", "gt_bboxes", "gt_RTs", "gt_scales",
                  "gt_handle_visibility", "pred_class_ids", "pred_bboxes",
                  "pred_scores", "pred_RTs", "pred_scales"):
            np.testing.assert_allclose(
                np.asarray(o["result"][k], float),
                np.asarray(r["result"][k], float), atol=1e-9, err_msg=k)
    assert n_insts >= 4


def test_composed_hypotheses_and_energies_match(composed):
    """Stage 2+3 composition: the sorted K-hypothesis RTs and energies in
    ``results_with_energy.pkl`` agree per instance (frame conventions,
    zero-centering, T0 plumbing, RT conversion, energy sort)."""
    ref = _load_results(os.path.join(composed["ref_dir"],
                                     "results_with_energy.pkl"))
    our = _load_results(os.path.join(composed["our_dir"],
                                     "results_with_energy.pkl"))
    assert set(ref.keys()) == set(our.keys()) and len(ref) > 0
    n_insts = 0
    for key in ref:
        r, o = ref[key]["result"], our[key]["result"]
        assert r["multi_hypothesis_pred_RTs"].shape == \
            o["multi_hypothesis_pred_RTs"].shape
        # integration-tolerance-level agreement (solver atol 1e-5 + our
        # batch padding sharing the adaptive step size across rows)
        np.testing.assert_allclose(o["multi_hypothesis_pred_RTs"],
                                   r["multi_hypothesis_pred_RTs"],
                                   atol=5e-3, rtol=0)
        np.testing.assert_allclose(o["energy"], r["energy"], atol=5e-3,
                                   rtol=1e-3)
        n_insts += r["multi_hypothesis_pred_RTs"].shape[0]
    assert n_insts >= 4


def _table_lines(log_dir, name):
    path = os.path.join(log_dir, name)
    with open(path) as f:
        lines = [ln.strip() for ln in f]
    keep = ("cls_name:", "mAP:", "Acc:", "degree", "ratio")
    return [ln for ln in lines if any(k in ln for k in keep)]


@pytest.mark.parametrize("pooling,ranker", [
    ("average", "energy_ranker"),   # the reference's released protocol
    ("nearest", "gt_ranker"),       # second protocol point, ratio 0.3
])
def test_composed_map_tables_identical(composed, pooling, ranker):
    """Stage 4 composition: the final eval_logs tables (mean + per-class,
    mAP and Acc at the four headline thresholds) are IDENTICAL between the
    reference's ``evaluate`` and ours — at the released protocol
    (energy_ranker + average pooling + ratio 0.6) AND at a second protocol
    point (gt_ranker + nearest pooling + ratio 0.3) that exercises the
    other ``sort_sRT_by_energy`` branches (``sgpa_utils.py:897-954``)."""
    ref_logs = os.path.join(composed["ref_dir"], "results", pooling, ranker)
    our_logs = os.path.join(composed["our_dir"], "results", pooling, ranker)
    for name in ("eval_logs.txt", "eval_logs_single_cls.txt"):
        ref_tbl = _table_lines(ref_logs, name)
        our_tbl = _table_lines(our_logs, name)
        assert len(ref_tbl) > 0, name
        assert ref_tbl == our_tbl, (name, ref_tbl, our_tbl)
    # non-degeneracy: the near-GT pass must produce at least one strictly
    # positive AP/Acc entry, so the equality above is not an
    # all-zeros-vs-all-zeros vacuity
    vals = [float(ln.rsplit(":", 1)[1]) for ln in
            _table_lines(ref_logs, "eval_logs.txt") if "degree" in ln]
    assert any(v > 0.0 for v in vals), vals
