"""Parity tests: native C++ preprocessing kernels vs the numpy oracles.

The native library (``genpose_tpu/native/preprocess.cpp``) re-implements the
reference's DataLoader-worker compute (``datasets_genpose.py:370-397``) and
host FPS (``sampling_gpu.cu:93-208``); the numpy fallbacks in
``genpose_tpu.data.dataset_utils`` are the oracles.
"""

import numpy as np
import pytest

from genpose_tpu import native
from genpose_tpu.data.dataset_utils import (
    backproject_and_sample,
    depth_to_pcl,
    get_2d_coord_np,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native lib unavailable"
)


def _roi(rng, h=32, w=32):
    depth = (rng.random((h, w)) * 1000).astype(np.float32)
    depth[rng.random((h, w)) < 0.3] = 0.0
    mask = (rng.random((h, w)) > 0.4).astype(np.float32)
    xymap = get_2d_coord_np(w, h)
    K = np.array([[600.0, 0, w / 2], [0, 600.0, h / 2], [0, 0, 1]], np.float32)
    return depth, mask, xymap, K


def test_backprojection_matches_numpy():
    rng = np.random.default_rng(0)
    depth, mask, xymap, K = _roi(rng)
    want = depth_to_pcl(depth, K, xymap, mask)
    got = native.depth_mask_to_pcl(
        depth, mask, xymap[0], xymap[1],
        fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_backprojection_scale():
    rng = np.random.default_rng(1)
    depth, mask, xymap, K = _roi(rng)
    base = native.depth_mask_to_pcl(
        depth, mask, xymap[0], xymap[1], K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    scaled = native.depth_mask_to_pcl(
        depth, mask, xymap[0], xymap[1], K[0, 0], K[1, 1], K[0, 2], K[1, 2],
        scale=1e-3)
    np.testing.assert_allclose(scaled, base * 1e-3, rtol=1e-5)


def test_sample_points_downsample_distinct_members():
    rng = np.random.default_rng(2)
    pcl = rng.random((500, 3)).astype(np.float32)
    out = native.sample_points(pcl, 128, seed=7)
    assert out.shape == (128, 3)
    # every output row is one of the inputs, and rows are distinct
    sets = {tuple(r) for r in np.round(out, 6)}
    all_rows = {tuple(r) for r in np.round(pcl, 6)}
    assert sets <= all_rows
    assert len(sets) == 128
    # deterministic per seed, different across seeds
    np.testing.assert_array_equal(out, native.sample_points(pcl, 128, seed=7))
    assert not np.array_equal(out, native.sample_points(pcl, 128, seed=8))


def test_sample_points_upsample_tiles():
    pcl = np.arange(15, dtype=np.float32).reshape(5, 3)
    out = native.sample_points(pcl, 13, seed=0)
    # reference tiling semantics: whole tiles then prefix remainder
    want = np.concatenate([np.tile(pcl, (2, 1)), pcl[:3]], axis=0)
    np.testing.assert_array_equal(out, want)


def test_fused_backproject_sample_consistent():
    rng = np.random.default_rng(3)
    depth, mask, xymap, K = _roi(rng)
    n_valid, pcl = backproject_and_sample(
        depth, K, xymap, mask, 64, np.random.default_rng(5), scale=1e-3)
    want_cloud = depth_to_pcl(depth, K, xymap, mask) * 1e-3
    assert n_valid == want_cloud.shape[0]
    all_rows = {tuple(r) for r in np.round(want_cloud, 7)}
    assert {tuple(r) for r in np.round(pcl, 7)} <= all_rows


def test_fps_matches_device_kernel():
    from genpose_tpu.ops.pointcloud import farthest_point_sample_ref
    rng = np.random.default_rng(4)
    pts = rng.standard_normal((2, 200, 3)).astype(np.float32)
    want = np.asarray(farthest_point_sample_ref(pts, 32))
    got = native.fps(pts, 32)
    np.testing.assert_array_equal(got, want)


def test_fps_single_cloud():
    rng = np.random.default_rng(5)
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    idx = native.fps(pts, 10)
    assert idx[0] == 0
    assert len(set(idx.tolist())) == 10


def test_sample_points_empty_cloud_returns_zeros():
    """n == 0 must return zeros in BOTH implementations (review regression:
    the C tiling loop spun forever with the GIL released; the numpy
    fallback raised ZeroDivisionError)."""
    from genpose_tpu import native
    from genpose_tpu.data.dataset_utils import sample_points as np_sample

    empty = np.zeros((0, 3), np.float32)
    got_np = np_sample(empty, 16, np.random.default_rng(0))
    np.testing.assert_array_equal(got_np, np.zeros((16, 3), np.float32))
    if native.get_lib() is not None:
        got_c = native.sample_points(empty, 16, seed=0)
        np.testing.assert_array_equal(got_c, np.zeros((16, 3), np.float32))

