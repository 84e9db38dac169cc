"""Pose error metrics with NOCS symmetry handling.

Re-design of reference ``utils/metrics.py``:

- :func:`pose_errors_jax` — fully-jittable batched rot/trans errors with the
  y-axis symmetry rule (bottle/can/bowl, handle-less mug;
  ``metrics.py:103-110``) expressed as ``jnp.where`` over a static per-class
  table instead of a Python loop.  This lets the ranking loss (which needs GT
  errors every training step, ``posenet_agent.py:227-259``) stay inside one
  jitted train step instead of bouncing to numpy.
- :func:`compute_RT_errors` / :func:`get_metrics` — numpy versions for the
  host-side mAP pipeline, matching ``metrics.py:79-118, 157-187`` exactly
  (including the cbrt(det) scale normalization for sRT matrices).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from genpose_tpu.ops.pose import get_pose_dim, get_rot_matrix, inverse_RT

_SYM_NAMES = ("bottle", "can", "bowl")


def symmetry_flags(synset_names: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
    """Static per-class tables: (is_y_symmetric, is_mug).

    Index 0 is reserved when names include 'BG'; callers pass class ids that
    index into exactly this list (ref ``metrics.py:104-105`` indexes
    ``synset_names[class_id]``).
    """
    sym = np.array([n in _SYM_NAMES for n in synset_names], dtype=bool)
    mug = np.array([n == "mug" for n in synset_names], dtype=bool)
    return sym, mug


def pose_errors_jax(
    pose_1: jnp.ndarray,
    pose_2: jnp.ndarray,
    class_ids: jnp.ndarray,
    handle_visibility: jnp.ndarray,
    synset_names: Sequence[str],
    pose_mode: str = "rot_matrix",
    o2c_pose: bool = False,
):
    """Batched (rot deg, trans cm*?) errors, jit-friendly.

    Matches the semantics of ``get_metrics`` -> ``compute_RT_errors``
    (``metrics.py:79-187``): y-axis angle for symmetric classes, geodesic
    angle otherwise, trans error in **centimeters** (x100).

    pose_i: [bs, pose_dim]; class_ids/handle_visibility: [bs].
    Returns (rot_error_deg [bs], trans_error_cm [bs]).
    """
    idx = get_pose_dim(pose_mode) - 3
    r1 = get_rot_matrix(pose_1[:, :idx], pose_mode)
    r2 = get_rot_matrix(pose_2[:, :idx], pose_mode)
    t1, t2 = pose_1[:, idx:], pose_2[:, idx:]

    if not o2c_pose:
        r1, t1 = inverse_RT(r1, t1)
        r2, t2 = inverse_RT(r2, t2)

    sym_table, mug_table = symmetry_flags(synset_names)
    sym_t = jnp.asarray(sym_table)
    mug_t = jnp.asarray(mug_table)
    cid = jnp.clip(class_ids.astype(jnp.int32), 0, len(sym_table) - 1)
    hv = handle_visibility.reshape(-1).astype(jnp.int32)
    symmetric = jnp.take(sym_t, cid) | (jnp.take(mug_t, cid) & (hv == 0))

    # y-axis comparison (columns are object axes)
    y1 = r1[..., :, 1]
    y2 = r2[..., :, 1]
    cos_sym = jnp.sum(y1 * y2, axis=-1) / jnp.clip(
        jnp.linalg.norm(y1, axis=-1) * jnp.linalg.norm(y2, axis=-1), 1e-8
    )
    rel = jnp.matmul(r1, jnp.swapaxes(r2, -1, -2),
                     precision=jax.lax.Precision.HIGHEST)
    cos_full = (rel[..., 0, 0] + rel[..., 1, 1] + rel[..., 2, 2] - 1.0) / 2.0

    cos = jnp.where(symmetric, cos_sym, cos_full)
    theta = jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))
    shift = jnp.linalg.norm(t1 - t2, axis=-1) * 100.0
    return theta, shift


# ---------------------------------------------------------------------------
# Host-side numpy versions (mAP pipeline parity; ref metrics.py:79-154)
# ---------------------------------------------------------------------------

def compute_RT_errors(RT_1, RT_2, class_id, handle_visibility, synset_names):
    """4x4 sRT error (ref ``metrics.py:79-118``): returns [theta_deg, shift_cm]."""
    if RT_1 is None or RT_2 is None:
        return -1
    assert np.array_equal(RT_1[3, :], RT_2[3, :])
    assert np.array_equal(RT_1[3, :], np.array([0, 0, 0, 1]))

    R1 = RT_1[:3, :3] / np.cbrt(np.linalg.det(RT_1[:3, :3]))
    T1 = RT_1[:3, 3]
    R2 = RT_2[:3, :3] / np.cbrt(np.linalg.det(RT_2[:3, :3]))
    T2 = RT_2[:3, 3]

    if synset_names[class_id] in ["bottle", "can", "bowl"] or (
        synset_names[class_id] == "mug" and handle_visibility == 0
    ):
        y = np.array([0, 1, 0])
        y1 = R1 @ y
        y2 = R2 @ y
        cos_theta = y1.dot(y2) / (np.linalg.norm(y1) * np.linalg.norm(y2))
    else:
        R = R1 @ R2.transpose()
        cos_theta = (np.trace(R) - 1) / 2

    theta = np.arccos(np.clip(cos_theta, -1.0, 1.0)) * 180 / np.pi
    shift = np.linalg.norm(T1 - T2) * 100
    return np.array([theta, shift])


def compute_RT_overlaps(class_ids, gt_RT, pred_RT, gt_handle_visibility, synset_names):
    """Per-instance error pairs (ref ``metrics.py:141-154``)."""
    num = len(class_ids)
    overlaps = np.zeros((num, 2))
    for i in range(num):
        overlaps[i, :] = compute_RT_errors(
            pred_RT[i], gt_RT[i], int(class_ids[i]), gt_handle_visibility[i],
            synset_names,
        )
    return overlaps


def get_metrics(
    pose_1,
    pose_2,
    class_ids,
    synset_names,
    gt_handle_visibility,
    pose_mode="rot_matrix",
    o2c_pose=False,
):
    """Numpy drop-in for the reference ``get_metrics`` (``metrics.py:157-187``).

    ``o2c_pose=False`` mirrors the reference FUNCTION default (the runners
    pass ``cfg.o2c_pose``, whose config default is True on both sides,
    ref ``config.py:11``).

    Returns (rot_error_deg [bs], trans_error_cm [bs]) as numpy arrays.
    """
    theta, shift = pose_errors_jax(
        jnp.asarray(pose_1), jnp.asarray(pose_2),
        jnp.asarray(np.asarray(class_ids).reshape(-1)),
        jnp.asarray(np.asarray(gt_handle_visibility).reshape(-1)),
        synset_names, pose_mode, o2c_pose,
    )
    return np.asarray(theta), np.asarray(shift)
