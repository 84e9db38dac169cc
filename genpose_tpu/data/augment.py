"""Batched 3D point-cloud augmentations (FS-Net style) as pure JAX.

Re-design of reference ``utils/data_augmentation.py:71-305``.  The reference
already wrote these batched + flag-gated (``*_in_batch`` variants +
``torch.where``), which maps 1:1 onto ``jnp.where`` keyed by an explicit
PRNG — the whole augmentation pipeline is ONE jitted function fused into the
training step (no separate CUDA launches).

Augmentations (probabilities in ``PtsAugConfig``; ref ``config.py:97-104``):
- bbox anisotropic scaling (symmetric classes share the x/z factor),
- random rigid rotation + translation,
- box-cage y-deformation for bowl (id 1) and mug (id 5),
- per-point jitter toward/away from the object center.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from genpose_tpu.config import PtsAugConfig


def get_rotation(x_deg, y_deg, z_deg) -> jnp.ndarray:
    """Rz @ Ry @ Rx from degrees (ref ``data_augmentation.py:197-213``)."""
    x, y, z = (jnp.radians(jnp.asarray(v, jnp.float32)) for v in (x_deg, y_deg, z_deg))
    cx, sx, cy, sy, cz, sz = jnp.cos(x), jnp.sin(x), jnp.cos(y), jnp.sin(y), \
        jnp.cos(z), jnp.sin(z)
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rz @ ry @ rx


def defor_3D_bb_in_batch(pc, model_point, R, t, s, sym, aug_bb):
    """Anisotropic bbox scaling in the object frame
    (ref ``data_augmentation.py:71-80``)."""
    pc_reproj = jnp.einsum("bij,bnj->bni", jnp.swapaxes(R, -1, -2),
                           pc - t[:, None, :])
    sym_aug_bb = (aug_bb + aug_bb[:, jnp.array([2, 1, 0])]) / 2.0
    sym_flag = (sym[:, 0:1] == 1)
    new_aug_bb = jnp.where(sym_flag, sym_aug_bb, aug_bb)
    pc_reproj = pc_reproj * new_aug_bb[:, None, :]
    model_point_new = model_point * new_aug_bb[:, None, :]
    pc_new = jnp.einsum("bij,bnj->bni", R, pc_reproj) + t[:, None, :]
    s_new = s * new_aug_bb
    return pc_new, s_new, model_point_new


def defor_3D_rt_in_batch(pc, R, t, aug_rt_t, aug_rt_r):
    """Random rigid perturbation (ref ``data_augmentation.py:187-194``)."""
    pc_new = pc + aug_rt_t[:, None, :]
    t_new = t + aug_rt_t
    pc_new = jnp.einsum("bij,bnj->bni", aug_rt_r, pc_new)
    R_new = jnp.matmul(aug_rt_r, R)
    t_new = jnp.einsum("bij,bj->bi", aug_rt_r, t_new)
    return pc_new, R_new, t_new


def defor_3D_bc_in_batch(key, pc, R, t, s, model_point, nocs_scale):
    """Box-cage deformation along y (ref ``data_augmentation.py:109-129``)."""
    bs = pc.shape[0]
    k1, k2 = jax.random.split(key)
    ey_up = jax.random.uniform(k1, (bs, 1), minval=0.8, maxval=1.2)
    ey_down = jax.random.uniform(k2, (bs, 1), minval=0.8, maxval=1.2)
    pc_reproj = jnp.einsum("bij,bnj->bni", jnp.swapaxes(R, -1, -2),
                           pc - t[:, None, :])
    s_y = s[..., 1:2]
    resize = (pc_reproj[..., 1] + s_y / 2.0) / s_y * (ey_up - ey_down) + ey_down
    pc_reproj = pc_reproj.at[..., 0].multiply(resize)
    pc_reproj = pc_reproj.at[..., 2].multiply(resize)
    pc_new = jnp.einsum("bij,bnj->bni", R, pc_reproj) + t[:, None, :]

    mp = model_point
    mp_resize = (mp[..., 1] + s_y / 2.0) / s_y * (ey_up - ey_down) + ey_down
    mp = mp.at[..., 0].multiply(mp_resize)
    mp = mp.at[..., 2].multiply(mp_resize)
    s_new = (jnp.max(mp, axis=1) - jnp.min(mp, axis=1)) * nocs_scale[:, None]
    return pc_new, s_new


def defor_3D_pc(key, pc, gt_t, r=0.2):
    """Per-point jitter relative to the object center
    (ref ``data_augmentation.py:136-143``)."""
    points_defor = jax.random.uniform(key, pc.shape) * r
    return pc + points_defor * (pc - gt_t[:, None, :])


def data_augment(
    key: jax.Array,
    pts_aug_params: PtsAugConfig,
    PC: jnp.ndarray,
    gt_R: jnp.ndarray,
    gt_t: jnp.ndarray,
    gt_s: jnp.ndarray,
    mean_shape: jnp.ndarray,
    sym: jnp.ndarray,
    aug_bb: jnp.ndarray,
    aug_rt_t: jnp.ndarray,
    aug_rt_r: jnp.ndarray,
    model_point: jnp.ndarray,
    nocs_scale: jnp.ndarray,
    obj_ids: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flag-gated batched augmentation (ref ``data_augmentation.py:234-305``).

    Returns (PC, gt_R, gt_t, gt_s) with per-sample Bernoulli gating.
    """
    bs = PC.shape[0]
    k_bb, k_rt, k_bc, k_bc_p, k_pc, k_pc_p = jax.random.split(key, 6)

    # bbox scaling
    flag = jax.random.uniform(k_bb, (bs, 1)) < pts_aug_params.aug_bb_pro
    PC_new, s_new, mp_new = defor_3D_bb_in_batch(
        PC, model_point, gt_R, gt_t, gt_s + mean_shape, sym, aug_bb
    )
    s_new = s_new - mean_shape
    PC = jnp.where(flag[..., None], PC_new, PC)
    gt_s = jnp.where(flag, s_new, gt_s)
    model_point = jnp.where(flag[..., None], mp_new, model_point)

    # rigid perturbation
    flag = jax.random.uniform(k_rt, (bs, 1)) < pts_aug_params.aug_rt_pro
    PC_new, R_new, t_new = defor_3D_rt_in_batch(PC, gt_R, gt_t, aug_rt_t, aug_rt_r)
    PC = jnp.where(flag[..., None], PC_new, PC)
    gt_R = jnp.where(flag[..., None], R_new, gt_R)
    gt_t = jnp.where(flag, t_new, gt_t)

    # box-cage (bowl id 1, mug id 5 with 0-indexed cat ids;
    # ref data_augmentation.py:292)
    obj_flat = obj_ids.reshape(bs)
    bc_class = jnp.logical_or(obj_flat == 5, obj_flat == 1)[:, None]
    flag = jnp.logical_and(
        jax.random.uniform(k_bc_p, (bs, 1)) < pts_aug_params.aug_bc_pro, bc_class
    )
    PC_new, s_new = defor_3D_bc_in_batch(
        k_bc, PC, gt_R, gt_t, gt_s + mean_shape, model_point, nocs_scale
    )
    PC = jnp.where(flag[..., None], PC_new, PC)
    gt_s = jnp.where(flag, s_new - mean_shape, gt_s)

    # per-point jitter
    flag = jax.random.uniform(k_pc_p, (bs, 1)) < pts_aug_params.aug_pc_pro
    PC_new = defor_3D_pc(k_pc, PC, gt_t, pts_aug_params.aug_pc_r)
    PC = jnp.where(flag[..., None], PC_new, PC)

    return PC, gt_R, gt_t, gt_s
