"""Batched pose / rotation math in pure JAX.

Functional re-design of the reference's rotation utilities:

- ``utils/genpose_utils.py:8-20``  (get_pose_dim)
- ``utils/misc.py:114-148``        (get_rot_matrix; note the *transposed*
  6D convention: the reference computes
  ``rotation_6d_to_matrix(d6).permute(0, 2, 1)`` so the 6D vector holds the
  first two **columns** of R)
- ``utils/misc.py:192-204``        (inverse_RT)
- ``utils/misc.py:227-249``        (average_quaternion_batch via 4x4 eigh)
- ``utils/misc.py:259-276``        (normalize_rotation)
- ``utils/metrics.py:12-33``       (rot_diff_rad / rot_diff_degree)

All functions are batched over a leading axis, jit-friendly (static shapes,
no data-dependent control flow) and differentiable where meaningful.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-8

POSE_MODES = ("quat_wxyz", "quat_xyzw", "euler_xyz", "euler_xyz_sx_cx", "rot_matrix")


def get_pose_dim(pose_mode: str) -> int:
    """Pose vector length per representation (reference ``genpose_utils.py:8-20``)."""
    if pose_mode in ("quat_wxyz", "quat_xyzw"):
        return 7
    if pose_mode == "euler_xyz":
        return 6
    if pose_mode in ("euler_xyz_sx_cx", "rot_matrix"):
        return 9
    raise NotImplementedError(f"pose mode {pose_mode} is not supported")


# ---------------------------------------------------------------------------
# quaternion <-> matrix
# ---------------------------------------------------------------------------

def quat_wxyz_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> rotation matrix.  q: [..., 4] -> [..., 3, 3]."""
    q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    rows = jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def matrix_to_quat_wxyz(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (w, x, y, z), branchless best-diagonal.

    m: [..., 3, 3] -> [..., 4].  Numerically stable for all rotations.
    Exactly matches pytorch3d's ``matrix_to_quaternion`` INCLUDING its
    behavior on non-orthonormal input: the NOCS eval protocol feeds scaled
    sRT rotations (s*R) through it during hypothesis pooling
    (ref ``sgpa_utils.py:940``), where the returned quaternion is neither
    unit-norm nor exactly the quaternion of R — the per-hypothesis norms
    weight the eigen-average, so normalizing here would shift mAP
    (certified by ``tests/test_reference_parity.py::test_compute_mAP_parity``).
    Unit-rotation inputs yield unit quaternions as usual.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    q_abs_sq = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    q_abs = jnp.sqrt(jnp.clip(q_abs_sq, 0.0))

    # Four candidate quaternions, one per dominant component.
    cand_w = jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cand_x = jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1)
    cand_y = jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1)
    cand_z = jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # [..., 4, 4]

    denom = 2.0 * jnp.clip(q_abs[..., None], 0.1)
    cands = cands / denom

    best = jnp.argmax(q_abs, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1), axis=-2)
    return q[..., 0, :]


# ---------------------------------------------------------------------------
# 6D rotation representation (transposed convention, utils/misc.py:136)
# ---------------------------------------------------------------------------

def rot6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """6D rep -> rotation matrix with the reference's *column* convention.

    The reference computes ``rotation_6d_to_matrix(d6).permute(0, 2, 1)``
    (``utils/misc.py:136``), i.e. ``d6[:3]`` is (up to Gram-Schmidt) the first
    **column** of R and ``d6[3:6]`` the second column.

    d6: [..., 6] -> [..., 3, 3]
    """
    a1, a2 = d6[..., :3], d6[..., 3:6]
    b1 = a1 / jnp.clip(jnp.linalg.norm(a1, axis=-1, keepdims=True), _EPS)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.clip(jnp.linalg.norm(a2p, axis=-1, keepdims=True), _EPS)
    b3 = jnp.cross(b1, b2)
    # columns b1, b2, b3
    return jnp.stack([b1, b2, b3], axis=-1)


def matrix_to_rot6d(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> 6D rep (first two columns), inverse of rot6d_to_matrix.

    Matches the dataset's ``matrix_to_rotation_6d(R.T)``
    (``datasets/datasets_genpose.py:690``): rows of R^T are columns of R.
    """
    return jnp.concatenate([m[..., :, 0], m[..., :, 1]], axis=-1)


# ---------------------------------------------------------------------------
# Euler (pytorch3d 'ZYX' convention, utils/misc.py:142-144)
# ---------------------------------------------------------------------------

def _axis_rot(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        rows = [(one, zero, zero), (zero, c, -s), (zero, s, c)]
    elif axis == "Y":
        rows = [(c, zero, s), (zero, one, zero), (-s, zero, c)]
    else:  # Z
        rows = [(c, -s, zero), (s, c, zero), (zero, zero, one)]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def euler_zyx_to_matrix(angles: jnp.ndarray) -> jnp.ndarray:
    """pytorch3d ``euler_angles_to_matrix(angles, 'ZYX')``: Rz(a0) Ry(a1) Rx(a2).

    angles: [..., 3] -> [..., 3, 3]
    """
    rz = _axis_rot("Z", angles[..., 0])
    ry = _axis_rot("Y", angles[..., 1])
    rx = _axis_rot("X", angles[..., 2])
    mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    return mm(rz, mm(ry, rx))


# ---------------------------------------------------------------------------
# Unified rotation extraction (utils/misc.py:114-148)
# ---------------------------------------------------------------------------

def get_rot_matrix(batch_pose: jnp.ndarray, pose_mode: str = "quat_wxyz") -> jnp.ndarray:
    """Rotation part of a pose vector -> [..., 3, 3] (reference ``misc.py:114-148``)."""
    if pose_mode == "quat_wxyz":
        return quat_wxyz_to_matrix(batch_pose)
    if pose_mode == "quat_xyzw":
        q = batch_pose[..., jnp.array([3, 0, 1, 2])]
        return quat_wxyz_to_matrix(q)
    if pose_mode == "rot_matrix":
        return rot6d_to_matrix(batch_pose)
    if pose_mode == "euler_xyz_sx_cx":
        theta = jnp.arctan2(batch_pose[..., :3], batch_pose[..., 3:6])
        return euler_zyx_to_matrix(theta)
    if pose_mode == "euler_xyz":
        return euler_zyx_to_matrix(batch_pose)
    raise NotImplementedError(f"rotation mode {pose_mode} is not supported")


def normalize_rotation(rotation: jnp.ndarray, pose_mode: str) -> jnp.ndarray:
    """Project the rotation block back to the manifold (reference ``misc.py:259-276``).

    For 'rot_matrix' this re-orthonormalizes and stores the first two columns;
    purely functional (no in-place mutation).
    """
    if pose_mode in ("quat_wxyz", "quat_xyzw"):
        return rotation / jnp.clip(jnp.linalg.norm(rotation, axis=-1, keepdims=True), _EPS)
    if pose_mode == "rot_matrix":
        return matrix_to_rot6d(rot6d_to_matrix(rotation))
    if pose_mode == "euler_xyz_sx_cx":
        theta = jnp.arctan2(rotation[..., :3], rotation[..., 3:6])
        return jnp.concatenate([jnp.sin(theta), jnp.cos(theta)], axis=-1)
    if pose_mode == "euler_xyz":
        return rotation
    raise NotImplementedError(f"rotation mode {pose_mode} is not supported")


def inverse_RT(rot: jnp.ndarray, trans: jnp.ndarray):
    """Invert (R, t): returns (R^T, -R^T t) (reference ``misc.py:192-204``)."""
    inv_rot = jnp.swapaxes(rot, -1, -2)
    inv_trans = -jnp.einsum("...ij,...j->...i", inv_rot, trans,
                            precision=jax.lax.Precision.HIGHEST)
    return inv_rot, inv_trans


def pose_to_rt(pose: jnp.ndarray, pose_mode: str):
    """Split a pose vector into (R [.., 3, 3], t [.., 3])."""
    idx = get_pose_dim(pose_mode) - 3
    return get_rot_matrix(pose[..., :idx], pose_mode), pose[..., idx:]


def rt_to_matrix4(rot: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """(R, t) -> homogeneous [..., 4, 4]."""
    batch = rot.shape[:-2]
    m = jnp.zeros(batch + (4, 4), dtype=rot.dtype)
    m = m.at[..., :3, :3].set(rot)
    m = m.at[..., :3, 3].set(trans)
    m = m.at[..., 3, 3].set(1.0)
    return m


def transform_batch_pts(
    batch_pts: jnp.ndarray,
    batch_pose: jnp.ndarray,
    pose_mode: str = "quat_wxyz",
    inverse_pose: bool = False,
) -> jnp.ndarray:
    """Apply pose to xyz channels of a point cloud (reference ``misc.py:158-189``).

    batch_pts: [B, N, C>=3]; batch_pose: [B, pose_dim].
    """
    rot, loc = pose_to_rt(batch_pose, pose_mode)
    if inverse_pose:
        rot, loc = inverse_RT(rot, loc)
    xyz = batch_pts[..., :3]
    new_xyz = jnp.einsum("bij,bnj->bni", rot, xyz,
                        precision=jax.lax.Precision.HIGHEST) + loc[:, None, :]
    return jnp.concatenate([new_xyz, batch_pts[..., 3:]], axis=-1)


# ---------------------------------------------------------------------------
# Quaternion averaging (utils/misc.py:227-249)
# ---------------------------------------------------------------------------

def average_quaternion_batch(Q: jnp.ndarray, weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Weighted average of quaternions via the 4x4 outer-product eigenproblem.

    Q: [B, K, 4] (wxyz); weights: [B, K] or None (uniform).
    Returns [B, 4] with w >= 0, matching reference ``misc.py:227-249``.
    """
    B, K, _ = Q.shape
    if weights is None:
        weights = jnp.full((B, K), 1.0 / K, dtype=Q.dtype)
    weight_sum = jnp.sum(weights, axis=-1)

    oriented = jnp.where(Q[..., :1] > 0, 1.0, -1.0) * Q
    A = jnp.einsum("bki,bkj,bk->bij", oriented, oriented, weights,
                   precision=jax.lax.Precision.HIGHEST)
    A = A / weight_sum[:, None, None]

    # Small symmetric 4x4 eigh; eigenvalues ascending -> take last eigenvector.
    _, vecs = jnp.linalg.eigh(A)
    q_avg = vecs[..., :, -1]
    q_avg = jnp.where(q_avg[..., :1] > 0, 1.0, -1.0) * q_avg
    return q_avg


# ---------------------------------------------------------------------------
# Rotation error (utils/metrics.py:12-33)
# ---------------------------------------------------------------------------

def rot_diff_rad(
    rot1: jnp.ndarray,
    rot2: jnp.ndarray,
    chosen_axis: str | None = None,
    flip_axis: bool = False,
) -> jnp.ndarray:
    """Geodesic angle between rotations, optionally about one symmetry axis.

    rot1/rot2: [..., 3, 3].  ``chosen_axis`` in {'x','y','z'} compares that
    **column** of R (reference ``metrics.py:12-22`` indexes ``rot[..., axis]``
    on a matrix laid out so that columns are object axes).
    """
    if chosen_axis is not None:
        axis = {"x": 0, "y": 1, "z": 2}[chosen_axis]
        y1, y2 = rot1[..., axis], rot2[..., axis]
        diff = jnp.sum(y1 * y2, axis=-1)
        rad = jnp.arccos(jnp.clip(diff, -1.0, 1.0))
        if flip_axis:
            rad = jnp.minimum(rad, jnp.pi - rad)
        return rad
    mat_diff = jnp.matmul(rot1, jnp.swapaxes(rot2, -1, -2),
                          precision=jax.lax.Precision.HIGHEST)
    trace = mat_diff[..., 0, 0] + mat_diff[..., 1, 1] + mat_diff[..., 2, 2]
    cos = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    return jnp.arccos(cos)


def rot_diff_degree(rot1, rot2, chosen_axis=None, flip_axis=False):
    return rot_diff_rad(rot1, rot2, chosen_axis, flip_axis) / jnp.pi * 180.0
