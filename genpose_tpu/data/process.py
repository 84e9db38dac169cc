"""Batch processing: augmentation + pose encoding + zero-centering (jitted).

Re-design of reference ``datasets_genpose.py:643-718`` (``process_batch``).
The whole function is jittable and runs on device right after the host
loader hands over raw numpy arrays.

Pose-mode note: for ``quat_wxyz`` the reference permutes the pytorch3d
(w,x,y,z) output by ``[3, 0, 1, 2]`` (``datasets_genpose.py:681``), i.e. it
assumed an (x,y,z,w) source and produced a scrambled (z,w,x,y) vector — a
latent bug in an unused path (released configs use ``rot_matrix``).  Here
both quaternion modes are encoded correctly.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from genpose_tpu.config import PtsAugConfig
from genpose_tpu.data.augment import data_augment
from genpose_tpu.ops.pose import matrix_to_quat_wxyz, matrix_to_rot6d


def matrix_to_euler_zyx(R: jnp.ndarray) -> jnp.ndarray:
    """Angles (az, ay, ax) with R = Rz(az) Ry(ay) Rx(ax) (pytorch3d 'ZYX')."""
    ay = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    az = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    ax = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return jnp.stack([az, ay, ax], axis=-1)


def encode_rotation(gt_R: jnp.ndarray, pose_mode: str) -> jnp.ndarray:
    """Rotation matrix [bs, 3, 3] -> pose-mode rotation vector
    (ref ``datasets_genpose.py:678-692``)."""
    if pose_mode == "quat_wxyz":
        return matrix_to_quat_wxyz(gt_R)
    if pose_mode == "quat_xyzw":
        q = matrix_to_quat_wxyz(gt_R)
        return q[..., jnp.array([1, 2, 3, 0])]
    if pose_mode == "euler_xyz":
        return matrix_to_euler_zyx(gt_R)
    if pose_mode == "euler_xyz_sx_cx":
        ang = matrix_to_euler_zyx(gt_R)
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    if pose_mode == "rot_matrix":
        # matrix_to_rotation_6d(R^T) == first two columns of R
        return matrix_to_rot6d(gt_R)
    raise NotImplementedError(pose_mode)


@functools.partial(jax.jit,
                   static_argnames=("pose_mode", "augment", "aug_params"))
def _process_batch_impl(batch, key, pose_mode: str, augment: bool,
                        aug_params: Optional[PtsAugConfig]):
    if augment:
        PC, gt_R, gt_t, gt_s = data_augment(
            key, aug_params,
            batch["pcl_in"], batch["rotation"], batch["translation"],
            batch["fsnet_scale"], batch["mean_shape"], batch["sym_info"],
            batch["aug_bb"], batch["aug_rt_t"], batch["aug_rt_R"],
            batch["model_point"], batch["nocs_scale"], batch["cat_id"],
        )
    else:
        PC, gt_R, gt_t = batch["pcl_in"], batch["rotation"], batch["translation"]

    rot = encode_rotation(gt_R, pose_mode)
    gt_pose = jnp.concatenate([rot, gt_t], axis=-1)

    center = jnp.mean(PC[:, :, :3], axis=1)
    zero_pts = PC.at[:, :, :3].add(-center[:, None, :])
    zero_pose = gt_pose.at[:, -3:].add(-center)

    return {
        "pts": PC,
        "pts_color": PC,
        "id": batch["cat_id"].reshape(-1).astype(jnp.int32),
        "handle_visibility": batch["handle_visibility"].reshape(-1).astype(jnp.int32),
        "gt_pose": gt_pose,
        "zero_mean_pts": zero_pts,
        "zero_mean_gt_pose": zero_pose,
        "pts_center": center,
    }


def process_batch(
    batch_sample: Dict,
    pose_mode: str = "rot_matrix",
    key: Optional[jax.Array] = None,
    pts_aug_params: Optional[PtsAugConfig] = None,
    mini_batch_size: Optional[int] = None,
) -> Dict[str, jnp.ndarray]:
    """Host entry point mirroring the reference signature
    (``datasets_genpose.py:643``).  Augments iff ``pts_aug_params`` given."""
    batch = {k: jnp.asarray(v) for k, v in batch_sample.items() if k != "path"}
    if mini_batch_size is not None:
        batch = {k: v[:mini_batch_size] for k, v in batch.items()}
    augment = pts_aug_params is not None
    if key is None:
        key = jax.random.PRNGKey(0)
    return _process_batch_impl(batch, key, pose_mode, augment,
                               pts_aug_params if augment else None)
