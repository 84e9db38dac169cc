"""Unit tests for genpose_tpu.ops.pose against hand values / numpy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from genpose_tpu.ops import pose


def random_rotations(n, rng):
    """Random rotation matrices via QR decomposition."""
    a = rng.normal(size=(n, 3, 3))
    q, r = np.linalg.qr(a)
    d = np.sign(np.diagonal(r, axis1=-2, axis2=-1))
    q = q * d[:, None, :]
    det = np.linalg.det(q)
    q[det < 0, :, 2] *= -1
    return q


def test_get_pose_dim():
    assert pose.get_pose_dim("quat_wxyz") == 7
    assert pose.get_pose_dim("quat_xyzw") == 7
    assert pose.get_pose_dim("euler_xyz") == 6
    assert pose.get_pose_dim("rot_matrix") == 9
    assert pose.get_pose_dim("euler_xyz_sx_cx") == 9
    with pytest.raises(NotImplementedError):
        pose.get_pose_dim("bogus")


def test_quat_matrix_roundtrip():
    rng = np.random.default_rng(0)
    R = random_rotations(32, rng)
    q = pose.matrix_to_quat_wxyz(jnp.asarray(R))
    R2 = pose.quat_wxyz_to_matrix(q)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)
    # unit norm, positive w
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0, atol=1e-6)


def test_quat_known_values():
    # identity
    np.testing.assert_allclose(
        np.asarray(pose.quat_wxyz_to_matrix(jnp.array([[1.0, 0, 0, 0]]))),
        np.eye(3)[None], atol=1e-7)
    # 90 deg about z: q = (cos45, 0, 0, sin45)
    c = np.cos(np.pi / 4)
    R = np.asarray(pose.quat_wxyz_to_matrix(jnp.array([[c, 0, 0, c]])))[0]
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_rot6d_column_convention():
    """The 6D vector holds the first two COLUMNS of R (utils/misc.py:136)."""
    rng = np.random.default_rng(1)
    R = random_rotations(16, rng)
    d6 = np.concatenate([R[:, :, 0], R[:, :, 1]], axis=-1)  # columns
    R2 = np.asarray(pose.rot6d_to_matrix(jnp.asarray(d6)))
    np.testing.assert_allclose(R2, R, atol=1e-5)
    # round trip through matrix_to_rot6d
    d6b = np.asarray(pose.matrix_to_rot6d(jnp.asarray(R)))
    np.testing.assert_allclose(d6b, d6, atol=1e-6)


def test_rot6d_gram_schmidt():
    # non-orthogonal input gets orthonormalized
    d6 = jnp.array([[2.0, 0, 0, 1.0, 1.0, 0]])
    R = np.asarray(pose.rot6d_to_matrix(d6))[0]
    np.testing.assert_allclose(R[:, 0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(R[:, 1], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(R[:, 2], [0, 0, 1], atol=1e-6)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_euler_zyx():
    # pure z rotation of 90deg
    R = np.asarray(pose.euler_zyx_to_matrix(jnp.array([[np.pi / 2, 0, 0]])))[0]
    np.testing.assert_allclose(R, [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6)
    # composition order: Rz @ Ry @ Rx
    a = np.array([[0.3, -0.2, 0.7]])
    R = np.asarray(pose.euler_zyx_to_matrix(jnp.asarray(a)))[0]

    def rz(t):
        return np.array([[np.cos(t), -np.sin(t), 0], [np.sin(t), np.cos(t), 0], [0, 0, 1]])

    def ry(t):
        return np.array([[np.cos(t), 0, np.sin(t)], [0, 1, 0], [-np.sin(t), 0, np.cos(t)]])

    def rx(t):
        return np.array([[1, 0, 0], [0, np.cos(t), -np.sin(t)], [0, np.sin(t), np.cos(t)]])

    np.testing.assert_allclose(R, rz(0.3) @ ry(-0.2) @ rx(0.7), atol=1e-6)


def test_inverse_rt():
    rng = np.random.default_rng(2)
    R = random_rotations(8, rng)
    t = rng.normal(size=(8, 3))
    Ri, ti = pose.inverse_RT(jnp.asarray(R), jnp.asarray(t))
    # composing pose with inverse gives identity
    I = np.einsum("bij,bjk->bik", np.asarray(Ri), R)
    np.testing.assert_allclose(I, np.tile(np.eye(3), (8, 1, 1)), atol=1e-6)
    np.testing.assert_allclose(
        np.einsum("bij,bj->bi", R, np.asarray(ti)) + t, np.zeros((8, 3)), atol=1e-6)


def test_normalize_rotation_rot_matrix():
    rng = np.random.default_rng(3)
    d6 = rng.normal(size=(8, 6)).astype(np.float32)
    out = np.asarray(pose.normalize_rotation(jnp.asarray(d6), "rot_matrix"))
    R = np.asarray(pose.rot6d_to_matrix(jnp.asarray(d6)))
    np.testing.assert_allclose(out[:, :3], R[:, :, 0], atol=1e-6)
    np.testing.assert_allclose(out[:, 3:6], R[:, :, 1], atol=1e-6)
    # idempotent
    out2 = np.asarray(pose.normalize_rotation(jnp.asarray(out), "rot_matrix"))
    np.testing.assert_allclose(out2, out, atol=1e-5)


def test_average_quaternion_identical():
    q = np.array([0.5, 0.5, 0.5, 0.5])
    Q = jnp.asarray(np.tile(q, (2, 5, 1)))
    avg = np.asarray(pose.average_quaternion_batch(Q))
    np.testing.assert_allclose(np.abs(avg), np.abs(np.tile(q, (2, 1))), atol=1e-5)


def test_average_quaternion_sign_invariance():
    """q and -q are the same rotation; averaging must orient them first."""
    rng = np.random.default_rng(4)
    q = rng.normal(size=(4,))
    q /= np.linalg.norm(q)
    Q = np.tile(q, (1, 6, 1))
    Q[0, ::2] *= -1  # flip signs of half
    avg = np.asarray(pose.average_quaternion_batch(jnp.asarray(Q)))[0]
    assert min(np.linalg.norm(avg - q), np.linalg.norm(avg + q)) < 1e-5


def test_average_quaternion_small_noise():
    """Average of noisy quats around identity stays near identity."""
    rng = np.random.default_rng(5)
    base = np.array([1.0, 0, 0, 0])
    noise = rng.normal(scale=0.01, size=(1, 50, 4))
    Q = base + noise
    Q /= np.linalg.norm(Q, axis=-1, keepdims=True)
    avg = np.asarray(pose.average_quaternion_batch(jnp.asarray(Q)))[0]
    R_avg = np.asarray(pose.quat_wxyz_to_matrix(jnp.asarray(avg[None])))[0]
    ang = np.degrees(np.arccos(np.clip((np.trace(R_avg) - 1) / 2, -1, 1)))
    assert ang < 1.0


def test_rot_diff():
    rng = np.random.default_rng(6)
    R1 = random_rotations(8, rng)
    # rotate each by a known angle about a random axis
    angles = rng.uniform(0.1, 3.0, size=8)
    axes = rng.normal(size=(8, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    from scipy.spatial.transform import Rotation as Rot
    delta = Rot.from_rotvec(axes * angles[:, None]).as_matrix()
    R2 = np.einsum("bij,bjk->bik", delta, R1)
    rad = np.asarray(pose.rot_diff_rad(jnp.asarray(R1), jnp.asarray(R2)))
    np.testing.assert_allclose(rad, angles, atol=1e-4)


def test_rot_diff_symmetry_axis():
    """Rotation about the y axis is invisible when comparing the y column."""
    R1 = np.eye(3)[None]
    ry = np.array([[np.cos(1.0), 0, np.sin(1.0)], [0, 1, 0], [-np.sin(1.0), 0, np.cos(1.0)]])
    R2 = (ry @ R1[0])[None]
    d = float(pose.rot_diff_degree(jnp.asarray(R1), jnp.asarray(R2), chosen_axis="y")[0])
    assert abs(d) < 1e-3
    d_full = float(pose.rot_diff_degree(jnp.asarray(R1), jnp.asarray(R2))[0])
    assert abs(d_full - np.degrees(1.0)) < 1e-3


def test_transform_batch_pts():
    rng = np.random.default_rng(7)
    R = random_rotations(2, rng)
    t = rng.normal(size=(2, 3)).astype(np.float32)
    d6 = np.concatenate([R[:, :, 0], R[:, :, 1]], axis=-1)
    pose_vec = jnp.asarray(np.concatenate([d6, t], axis=-1), dtype=jnp.float32)
    pts = rng.normal(size=(2, 10, 3)).astype(np.float32)
    out = np.asarray(pose.transform_batch_pts(jnp.asarray(pts), pose_vec, "rot_matrix"))
    expected = np.einsum("bij,bnj->bni", R, pts) + t[:, None]
    np.testing.assert_allclose(out, expected, atol=1e-5)
    # inverse_pose undoes it
    back = np.asarray(pose.transform_batch_pts(jnp.asarray(out), pose_vec, "rot_matrix",
                                               inverse_pose=True))
    np.testing.assert_allclose(back, pts, atol=1e-5)
