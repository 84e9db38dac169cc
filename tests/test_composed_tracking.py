"""Composed TRACKING-pipeline golden test.

``test_composed_pipeline.py`` proves the single-frame eval COMPOSITION
(stages 2-4) against the reference; this test does the same for the tracking
driver: the reference's own ``runners/evaluation_tracking.main_tracking``
(``evaluation_tracking.py:262-337``) runs end-to-end on CPU torch via the
bridge — per-frame mrcnn pkl -> instance clouds -> prev-frame/noised-GT
prior -> ``cond_ode_sampler`` with ``init_x``+``T0=0.15`` -> energy sort ->
top-60% ``cal_average_sRT`` quaternion pooling -> per-class metrics — and
our ``runners/evaluation_tracking.main_tracking`` must reproduce the pooled
per-instance sRTs and the final metrics on the same synthetic sequence with
the same randomized weights ported into the flax agents.

Determinism:

- ``add_noise_to_RT`` is patched to the identity on BOTH sides (the two
  noise streams are incomparable; the prior pathway itself — sRT -> 9D,
  ``-pts_center``, prev-frame match by model name — is what composition
  must prove).
- The sampler's additive prior draw on top of ``init_x``
  (ref ``samplers.py:180``) is pinned to the same fixed nonzero rows on
  both sides, so the K hypotheses are distinct and the energy sort + pool
  do real work.
- Frame extraction runs in the deterministic tiling regime: ``img_size=16``
  caps each instance at 16x16=256 valid pixels and ``num_points=256`` means
  both sides hit the tile-then-prefix branch (ref
  ``evaluation_tracking.py:101-104``) — no random permutation, so the
  per-instance clouds agree to float precision and extraction parity is
  asserted directly as well.

Residual differences (reference scipy RK45 vs our on-device adaptive RK45,
its flipped-sign eps-denoise microstep, our power-of-two instance padding
sharing one adaptive step across rows) are bounded far below the assertion
tolerances, as in the single-frame composed test.
"""

from __future__ import annotations

import importlib
import os
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
from genpose_tpu.runners import evaluation_tracking as ours

N_PTS = 256
IMG_SIZE = 16
K = 5
T0 = 0.15

# Fixed additive prior rows shared by both sides (instance-major fold,
# row = instance * K + k; our padding only appends rows past n_real * K).
_PRIOR = np.asarray(np.random.RandomState(31).randn(64, 9), np.float32)
_prior_rows = rb.make_prior_rows(_PRIOR)


@pytest.fixture(scope="module")
def composed_tracking(tmp_path_factory):
    root = tmp_path_factory.mktemp("composed_tracking")
    cwd = os.getcwd()
    os.chdir(root)
    # every torch / reference-module global patched below is recorded and
    # restored at teardown so later tests in the session see the real
    # attributes (torch.Tensor.cuda, the reference runner's noise/metrics)
    patch = rb.Patcher()
    try:
        nocs = make_synthetic_nocs_dir(
            str(root / "nocs"), n_camera_scenes=1, n_real_scenes=3, seed=23)
        ref_res = str(root / "refres")
        our_res = str(root / "ourres")
        # identical pkl content in both result dirs (the generator is
        # deterministic given the label pkls)
        make_synthetic_mrcnn_results(nocs, ref_res, "real_test",
                                     tracking=True)
        make_synthetic_mrcnn_results(nocs, our_res, "real_test",
                                     tracking=True)

        common_flags = [
            "--test_source", "real_test", "--data_path", nocs,
            "--eval_repeat_num", str(K), "--num_points", str(N_PTS),
            "--img_size", str(IMG_SIZE), "--T0", str(T0),
            "--pooling_mode", "average", "--ranker", "energy_ranker",
        ]

        # ---- import the reference tracking runner with a matching cfg ----
        rb.install_stubs()
        if rb.REF_ROOT not in sys.path:
            sys.path.insert(0, rb.REF_ROOT)
        rb.patch_runner_cuda(patch)

        argv = sys.argv
        sys.argv = ["genpose", "--result_dir", ref_res,
                    "--sampler_mode", "ode", "--device", "cpu",
                    "--score_model_dir", "ref_score.pth",
                    "--energy_model_dir", "ref_energy.pth"] + common_flags
        try:
            et = importlib.import_module("runners.evaluation_tracking")
        finally:
            sys.argv = argv

        # ---- shared randomized weights saved as reference checkpoints ----
        tscore = rb.make_gf_net("score", 51, N_PTS)
        tenergy = rb.make_gf_net("energy", 53, N_PTS)
        os.makedirs("results/ckpts", exist_ok=True)
        torch.save({"model_state_dict": tscore.state_dict()},
                   "results/ckpts/ref_score.pth")
        torch.save({"model_state_dict": tenergy.state_dict()},
                   "results/ckpts/ref_energy.pth")

        # determinism patches on the reference module: identity prior noise,
        # pinned additive prior rows, captured pooled sRTs and metrics
        patch(et, "add_noise_to_RT", lambda x: x.clone())
        real_posenet = et.PoseNet

        def _det_posenet(cfg):
            agent = real_posenet(cfg)
            agent.net.prior_fn = lambda shape, T=None: torch.from_numpy(
                _prior_rows(shape[0]).copy())
            return agent

        patch(et, "PoseNet", _det_posenet)

        ref_srt, ref_metrics = [], {}
        real_rt_errors = et.compute_RT_errors

        def _rec_rt(sRT, gt, cat_id, hv, names):
            ref_srt.append(np.array(sRT, float))
            return real_rt_errors(sRT, gt, cat_id, hv, names)

        patch(et, "compute_RT_errors", _rec_rt)
        real_gm = et.get_metrics

        def _rec_gm(errors):
            m = real_gm(errors)
            ref_metrics.update(m)
            return m

        patch(et, "get_metrics", _rec_gm)

        # ---- run the reference composed tracking driver ----
        et.main_tracking(tracking=True, T0=T0)

        # ---- extraction parity (deterministic tiling regime) ----
        our_cfg = get_config(["--result_dir", our_res,
                              "--sampler_mode", "ode_adaptive"] + common_flags)
        with open(os.path.join(nocs, "Real/test_list.txt")) as f:
            img_list = sorted(
                os.path.join("Real", ln.rstrip("\n")) for ln in f)
        rng = np.random.default_rng(0)
        ref_frames, our_frames = [], []
        for path in img_list:
            rf = et.extract_single_frame_data(path)
            of = ours.extract_single_frame_data(our_cfg, path, rng)
            ref_frames.append(rf)
            our_frames.append(of)

        # ---- run OUR composed tracking driver with ported weights ----
        our_srt = []
        real_ours_rt = ours.compute_RT_errors

        def _rec_ours_rt(sRT, gt, cat_id, hv, names):
            our_srt.append(np.array(sRT, float))
            return real_ours_rt(sRT, gt, cat_id, hv, names)

        real_ours_agent = ours.PoseAgent
        real_ours_noise = ours.add_noise_to_RT
        ours.compute_RT_errors = _rec_ours_rt
        ours.add_noise_to_RT = lambda key, gt: gt
        ours.PoseAgent = lambda cfg, mode, **kw: rb.ported_flax_agent(
            cfg, mode, tscore if mode == "score" else tenergy, _prior_rows)
        try:
            our_metrics = ours.main_tracking(our_cfg, tracking=True, T0=T0)
        finally:
            ours.compute_RT_errors = real_ours_rt
            ours.add_noise_to_RT = real_ours_noise
            ours.PoseAgent = real_ours_agent

        yield {
            "ref_frames": ref_frames, "our_frames": our_frames,
            "ref_srt": ref_srt, "our_srt": our_srt,
            "ref_metrics": ref_metrics, "our_metrics": our_metrics,
        }
    finally:
        patch.restore()
        os.chdir(cwd)


def test_tracking_frame_extraction_parity(composed_tracking):
    """Per-frame mrcnn pkl -> instance clouds: both extractions agree to
    float precision (crop window, warp-affine maps, backprojection, tiling
    sampler) and carry identical gt metadata."""
    n_frames = n_insts = 0
    for rf, of in zip(composed_tracking["ref_frames"],
                      composed_tracking["our_frames"]):
        assert (rf is None) == (of is None)
        if rf is None:
            continue
        n_frames += 1
        assert rf["model_name"] == list(of["model_name"])
        np.testing.assert_array_equal(np.asarray(rf["cat_id"]),
                                      np.asarray(of["cat_id"]))
        np.testing.assert_allclose(np.asarray(rf["gt_pose"]),
                                   np.asarray(of["gt_pose"]), atol=1e-6)
        ref_pts = np.asarray(rf["pts"])
        our_pts = np.asarray(of["pts"])
        assert ref_pts.shape == our_pts.shape == (
            ref_pts.shape[0], N_PTS, 3)
        np.testing.assert_allclose(our_pts, ref_pts, atol=1e-6)
        n_insts += ref_pts.shape[0]
    assert n_frames >= 2 and n_insts >= 4


def test_tracking_pooled_srt_parity(composed_tracking):
    """The per-instance pooled sRTs entering the metric agree across the
    whole sequence — prior plumbing (noised GT on first sight, prev-frame
    match thereafter), K-hypothesis sampling from T0, energy sort, and
    top-60% quaternion pooling compose identically."""
    ref_srt = composed_tracking["ref_srt"]
    our_srt = composed_tracking["our_srt"]
    assert len(ref_srt) == len(our_srt) and len(ref_srt) >= 4
    for i, (r, o) in enumerate(zip(ref_srt, our_srt)):
        np.testing.assert_allclose(o, r, atol=5e-3, err_msg=f"instance {i}")


def test_tracking_metrics_parity(composed_tracking):
    """Final per-class mean (deg, cm) errors and 5d5cm accuracy agree."""
    ref_m = composed_tracking["ref_metrics"]
    our_m = composed_tracking["our_metrics"]
    assert set(ref_m.keys()) == set(our_m.keys()) and len(ref_m) >= 2
    for cls in ref_m:
        np.testing.assert_allclose(
            np.asarray(our_m[cls]["mean_error"], float),
            np.asarray(ref_m[cls]["mean_error"], float),
            atol=0.05, err_msg=cls)
        assert our_m[cls]["5d5cm_acc"] == pytest.approx(
            ref_m[cls]["5d5cm_acc"], abs=1e-9), cls
