"""Pose-prior noise model for tracking (re-design of ``utils/tracking_utils.py``,
itself adapted from CAPTRA).

``add_noise_to_RT``: jitter each rotation by |N(0,1)| * 5 deg about a random
orthogonal quaternion direction and each translation by a random direction
scaled by N(0,1) * 3cm (ref ``tracking_utils.py:87-102``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from genpose_tpu.ops.pose import matrix_to_quat_wxyz, quat_wxyz_to_matrix


def _normalize(q):
    return q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-9)


def jitter_quaternion(key, q, theta):
    """Rotate unit quaternions q [B, 4] by angle theta [B, 1] toward a random
    orthogonal direction (ref ``tracking_utils.py:40-50``)."""
    rand_q = _normalize(jax.random.normal(key, q.shape))
    dot = jnp.sum(q * rand_q, axis=-1, keepdims=True)
    q_orth = _normalize(rand_q - q * dot)
    return q * jnp.cos(theta / 2) + q_orth * jnp.sin(theta / 2)


def add_noise_to_RT(key: jax.Array, RT: jnp.ndarray, noise_type: str = "normal",
                    r_deg: float = 5.0, t: float = 0.03) -> jnp.ndarray:
    """Noise a batch of 4x4 poses (ref ``tracking_utils.py:87-102``)."""
    k_theta, k_dir, k_norm, k_q = jax.random.split(key, 4)
    B = RT.shape[0]
    rad = r_deg / 180.0 * jnp.pi
    if noise_type == "normal":
        theta = jnp.abs(jax.random.normal(k_theta, (B,))) * rad
        norm = jax.random.normal(k_norm, (B,)) * t
        direction = jax.random.normal(k_dir, (B, 3))
    elif noise_type == "uniform":
        theta = jax.random.uniform(k_theta, (B,)) * rad
        norm = (jax.random.uniform(k_norm, (B,)) * 2 - 1) * t
        direction = jax.random.uniform(k_dir, (B, 3)) * 2 - 1
    else:
        raise NotImplementedError(noise_type)

    quat = matrix_to_quat_wxyz(RT[:, :3, :3])
    new_q = jitter_quaternion(k_q, quat, theta[:, None])
    new_R = quat_wxyz_to_matrix(new_q)

    direction = direction / jnp.clip(
        jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-9)
    new_t = RT[:, :3, 3] + direction * norm[:, None]

    out = RT
    out = out.at[:, :3, :3].set(new_R)
    out = out.at[:, :3, 3].set(new_t)
    return out


def srt_to_pose9d(sRT: jnp.ndarray) -> jnp.ndarray:
    """4x4 pose -> 9D (col0, col1, t) init vector for the sampler
    (ref ``evaluation_tracking.py:309``)."""
    cols = sRT[:, :3, jnp.array([0, 1, 3])]  # [B, 3, 3] columns 0,1,3
    return jnp.transpose(cols, (0, 2, 1)).reshape(sRT.shape[0], -1)
