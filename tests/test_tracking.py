"""Tracking runner tests, incl. the dropped-detection regression.

A detection whose mask has no valid depth must be dropped from EVERY
per-instance array consistently (pts, cat_id, gt_pose, model_name,
handle_visibility) — a mismatch crashes the prior lookup or pairs
predictions with the wrong GT (found in review, fixed in
``extract_single_frame_data``).
"""

import os
import pickle

import numpy as np
import pytest

from genpose_tpu.config import get_config
from genpose_tpu.data.synthetic import (
    make_synthetic_mrcnn_results,
    make_synthetic_nocs_dir,
)
from genpose_tpu.runners import evaluation_tracking as trk


@pytest.fixture(scope="module")
def tracking_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("trk")
    nocs = make_synthetic_nocs_dir(str(root / "nocs"), n_camera_scenes=1,
                                   n_real_scenes=2, seed=21)
    out = make_synthetic_mrcnn_results(nocs, str(root / "res"), "real_test",
                                       tracking=True)
    return nocs, str(root / "res"), out


def _zero_out_one_mask(out_dir):
    """Make the first instance of every frame undetectable (empty mask)."""
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        with open(p, "rb") as f:
            entry = pickle.load(f)
        entry["pred"]["masks"][:, :, 0] = False
        with open(p, "wb") as f:
            pickle.dump(entry, f)


def test_extract_filters_all_fields_consistently(tracking_tree):
    nocs, res, out_dir = tracking_tree
    cfg = get_config(["--data_path", nocs, "--result_dir", res,
                      "--test_source", "real_test", "--num_points", "64"])
    with open(os.path.join(nocs, "Real/test_list.txt")) as f:
        path = os.path.join("Real", f.readline().strip())

    rng = np.random.default_rng(0)
    full = trk.extract_single_frame_data(cfg, path, rng)
    n_full = len(full["pts"])
    assert (len(full["model_name"]) == n_full
            and full["gt_pose"].shape[0] == n_full
            and full["gt_handle_visibility"].shape[0] == n_full)

    _zero_out_one_mask(out_dir)
    try:
        part = trk.extract_single_frame_data(cfg, path, rng)
        assert len(part["pts"]) == n_full - 1
        # every per-instance field shrank together
        assert len(part["model_name"]) == n_full - 1
        assert part["gt_pose"].shape[0] == n_full - 1
        assert part["gt_handle_visibility"].shape[0] == n_full - 1
        # the surviving instances keep their own (normalized) GT poses
        want = np.array(full["gt_pose"][1:])
        np.testing.assert_allclose(part["gt_pose"], want, atol=1e-5)
    finally:
        # restore for other tests sharing the fixture
        make_synthetic_mrcnn_results(nocs, res, "real_test", tracking=True)


def test_tracking_runs_with_dropped_instance(tracking_tree, tmp_path,
                                             monkeypatch):
    """main_tracking survives frames where a detection is dropped."""
    nocs, res, out_dir = tracking_tree
    monkeypatch.chdir(tmp_path)
    _zero_out_one_mask(out_dir)
    try:
        cfg = get_config(["--data_path", nocs, "--result_dir", res,
                          "--test_source", "real_test",
                          "--eval_repeat_num", "2", "--sampling_steps", "4",
                          "--num_points", "64", "--batch_size", "4"])
        metrics = trk.main_tracking(cfg, tracking=True, T0=0.15)
        assert "all" in metrics
        assert np.isfinite(metrics["all"]["mean_error"]).all()
    finally:
        make_synthetic_mrcnn_results(nocs, res, "real_test", tracking=True)


def test_tracking_with_adaptive_sampler(tracking_tree, tmp_path, monkeypatch):
    """--sampler_mode ode_adaptive (the canonical scripts' setting, matching
    the reference's always-adaptive solve_ivp) resolves through the fused
    frame pipeline end-to-end."""
    nocs, res, out_dir = tracking_tree
    monkeypatch.chdir(tmp_path)
    cfg = get_config(["--data_path", nocs, "--result_dir", res,
                      "--test_source", "real_test",
                      "--sampler_mode", "ode_adaptive",
                      "--eval_repeat_num", "2",
                      "--num_points", "64", "--batch_size", "4"])
    metrics = trk.main_tracking(cfg, tracking=True, T0=0.15)
    assert "all" in metrics
    assert np.isfinite(metrics["all"]["mean_error"]).all()


def test_cal_average_srt_matches_device_pooling():
    """``cal_average_sRT`` is the host-side numpy twin of the device pooling
    the frame pipeline actually uses (``PoseAgent.aggregate_hypotheses``);
    this pins the two implementations to each other so they cannot drift."""
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation as Rot

    from genpose_tpu.config import Config
    from genpose_tpu.ops.pose import get_rot_matrix
    from genpose_tpu.runners.evaluation_tracking import cal_average_sRT
    from genpose_tpu.training.agent import PoseAgent

    rng = np.random.default_rng(5)
    bs, K, keep = 3, 8, 4
    srt = np.tile(np.identity(4), (bs, K, 1, 1))
    for b in range(bs):
        for k in range(K):
            srt[b, k, :3, :3] = Rot.random(
                random_state=int(rng.integers(1 << 30))).as_matrix()
            srt[b, k, :3, 3] = rng.normal(size=3)

    host = cal_average_sRT(srt, keep)

    agent = PoseAgent(Config(num_points=32, pts_encoder="pointnet"), "score")
    # device path consumes the 9D (col0, col1, t) vectors the runners build
    from genpose_tpu.utils.tracking import srt_to_pose9d

    pose9d = srt_to_pose9d(
        jnp.asarray(srt[:, :keep].reshape(bs * keep, 4, 4))
    ).reshape(bs, keep, 9)
    _, avg = agent.aggregate_hypotheses(pose9d)
    dev_R = np.asarray(get_rot_matrix(jnp.asarray(avg[:, :4]), "quat_wxyz"))
    np.testing.assert_allclose(dev_R, host[:, :3, :3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(avg[:, -3:]), host[:, :3, 3],
                               atol=1e-5)
