"""Tests for the visualization subsystem (grid render, SO(3) Mollweide)."""

import numpy as np
import pytest

from genpose_tpu.utils.so3_visualize import matrix_to_euler_zxy
from genpose_tpu.utils.visualize import (
    create_grid_image,
    get_camera_pose,
    project_pts_to_image,
    pts_views,
)


def _rot_zxy(a0, a1, a2):
    cz, sz = np.cos(a0), np.sin(a0)
    cx, sx = np.cos(a1), np.sin(a1)
    cy, sy = np.cos(a2), np.sin(a2)
    Z = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    X = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Y = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    return Z @ X @ Y


def test_euler_zxy_roundtrip():
    rng = np.random.default_rng(0)
    angles = np.stack([
        rng.uniform(-np.pi, np.pi, 20),       # z free
        rng.uniform(-1.4, 1.4, 20),           # x within gimbal-safe range
        rng.uniform(-np.pi, np.pi, 20),       # y free
    ], axis=1)
    for a in angles:
        R = _rot_zxy(*a)
        got = matrix_to_euler_zxy(R)
        np.testing.assert_allclose(got, a, atol=1e-8)


def test_camera_pose_look_at():
    R, T = get_camera_pose([0, 0, -0.5], [0, 0, 0], [0, -1, 0])
    np.testing.assert_allclose(T, [0, 0, -0.5])
    # camera z axis points at the origin
    np.testing.assert_allclose(R[:, 2], [0, 0, 1], atol=1e-12)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)


def test_projection_hits_principal_point():
    # a point on the optical axis of the front camera lands at (cx, cy)
    img = project_pts_to_image(np.array([[0.0, 0.0, 0.0]]))
    assert img.shape == (360, 360, 3)
    v, u = np.argwhere((img != 255).any(axis=-1))[0]
    # scaled principal point: cx * 360/640 = 179.7 -> 180 after rounding
    assert abs(u - 180) <= 1 and abs(v - 180) <= 1


def test_pts_views_and_grid():
    rng = np.random.default_rng(1)
    pts = (rng.random((4, 128, 3)).astype(np.float32) - 0.5) * 0.2
    front, top = pts_views(pts[0])
    assert front.shape == top.shape == (360, 360, 3)
    assert (front != 255).any() and (top != 255).any()

    # rot_matrix pose mode = 6D rotation + translation (9 dims total)
    eye_6d = np.tile(np.array([[1, 0, 0, 0, 1, 0]], np.float32), (4, 1))
    pose = np.concatenate([eye_6d, np.zeros((4, 3), np.float32)], axis=1)
    grid, images = create_grid_image(pts, pose, pose, None, "rot_matrix")
    assert images.shape == (4, 360, 4 * 360, 3)
    assert grid.shape == (4 * 360, 4 * 360, 3)
    # identical pred/gt pose -> pred columns == gt columns
    np.testing.assert_array_equal(images[:, :, :720], images[:, :, 720:])


def test_visualize_so3_writes_png(tmp_path):
    pytest.importorskip("matplotlib")
    from genpose_tpu.utils.so3_visualize import visualize_so3

    rng = np.random.default_rng(2)
    # random rotations via QR
    A = rng.standard_normal((10, 3, 3))
    Q = np.linalg.qr(A)[0]
    det = np.linalg.det(Q)
    Q[det < 0, :, 0] *= -1
    out = tmp_path / "so3.png"
    img = visualize_so3(str(out), Q, gt_rotation=np.eye(3))
    assert out.exists()
    assert img.ndim == 3 and img.shape[2] == 3


def test_so3_visualization_energy_weighting(tmp_path):
    pytest.importorskip("matplotlib")
    from genpose_tpu.utils.visualize import so3_visualization

    rng = np.random.default_rng(3)
    Q = np.linalg.qr(rng.standard_normal((5, 3, 3)))[0]
    det = np.linalg.det(Q)
    Q[det < 0, :, 0] *= -1
    energy = rng.standard_normal((5, 2))
    out = tmp_path / "dist.png"
    so3_visualization(Q, energy=energy, gt_rot=np.eye(3), save_path=str(out))
    assert out.exists()
