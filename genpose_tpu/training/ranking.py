"""Ranking loss and energy-based hypothesis sorting.

Re-design of reference ``networks/reward.py``:

- :func:`ranking_loss` — the reference's O(K^2) Python double loop
  (``reward.py:109-128``) becomes one broadcast over an upper-triangular
  pair mask (pure VPU work, jittable).
- :func:`sort_results` — sort energies by GT error per channel
  (``reward.py:63-83``).
- :func:`sort_poses_by_energy` — decoupled rot/trans hypothesis sort
  (``reward.py:131-155``): poses ordered by rot-energy, translations
  re-gathered by trans-energy.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from genpose_tpu.ops.pose import get_pose_dim


def ranking_loss(energy: jnp.ndarray) -> jnp.ndarray:
    """Pairwise sign-based margin over K energies sorted by GT error.

    energy: [bs, K, 2] with index 1 ordered best-to-worst (ascending GT
    error).  For each ordered pair i<j the loss term is
    ``1 + (E_j - E_i) / (|E_i - E_j| + 1e-5)``: ~0 when the better pose has
    higher energy (E_i > E_j), ~2 when mis-ranked (ref ``reward.py:109-128``).
    """
    K = energy.shape[1]
    if K < 2:
        # no ordered pairs: zero loss instead of a silent 0/0 NaN that
        # would poison the whole energy train step
        return jnp.float32(0.0)
    e_i = energy[:, :, None, :]  # i (better) axis
    e_j = energy[:, None, :, :]  # j (worse) axis
    diff = 1.0 + (e_j - e_i) / (jnp.abs(e_i - e_j) + 1e-5)
    pair_mask = jnp.triu(jnp.ones((K, K), dtype=bool), k=1)  # i < j
    # reference: mean over (bs, channels) per pair, then mean over pairs —
    # identical to a masked mean over all entries.
    masked = jnp.where(pair_mask[None, :, :, None], diff, 0.0)
    n_pairs = K * (K - 1) // 2
    return jnp.sum(masked) / (n_pairs * energy.shape[0] * energy.shape[-1])


def sort_results(energy: jnp.ndarray, metrics: jnp.ndarray) -> jnp.ndarray:
    """Gather energies into GT-error order per channel (ref ``reward.py:63-83``).

    energy/metrics: [bs, K, 2] (channel 0 = rotation, 1 = translation).
    """
    rot_idx = jnp.argsort(metrics[..., 0], axis=1)
    trans_idx = jnp.argsort(metrics[..., 1], axis=1)
    e_rot = jnp.take_along_axis(energy[..., 0], rot_idx, axis=1)
    e_trans = jnp.take_along_axis(energy[..., 1], trans_idx, axis=1)
    return jnp.stack([e_rot, e_trans], axis=-1)


def sort_poses_by_energy(poses: jnp.ndarray, energy: jnp.ndarray):
    """Rank hypotheses from highest to lowest energy, decoupled rot/trans
    (ref ``reward.py:131-155``).

    poses: [bs, K, pose_dim]; energy: [bs, K, 2].
    Returns (sorted_poses [bs, K, pose_dim], sorted_energy [bs, K, 2]).
    The pose rows follow the ROTATION-energy order; the last 3 columns
    (translation) are re-gathered by the TRANSLATION-energy order.
    """
    order = jnp.argsort(-energy, axis=1)  # descending per channel
    sorted_energy = jnp.take_along_axis(energy, order, axis=1)
    rot_order = order[..., 0]
    trans_order = order[..., 1]
    sorted_poses = jnp.take_along_axis(poses, rot_order[..., None], axis=1)
    sorted_trans = jnp.take_along_axis(poses[..., -3:], trans_order[..., None], axis=1)
    sorted_poses = jnp.concatenate([sorted_poses[..., :-3], sorted_trans], axis=-1)
    return sorted_poses, sorted_energy


class RewardModel(nn.Module):
    """Standalone pose-reward MLP (ref ``reward.py:14-60``).

    Unused by the default GenPose pipeline (the energy net plays this role);
    kept for capability parity.  Architecture mirrors the reference: pose
    encoder pose_dim->256->256, concat with the 1024-d pts feature, decoder
    1280->256->2 (rotation score, translation score).
    """

    pose_mode: str = "rot_matrix"
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, pts_feature, pose):
        """pts_feature [bs, 1024], pose [bs, pose_dim] -> [bs, 2]."""
        if pose.shape[-1] != get_pose_dim(self.pose_mode):
            raise ValueError(
                f"pose dim {pose.shape[-1]} != "
                f"{get_pose_dim(self.pose_mode)} for {self.pose_mode!r}")
        h = nn.relu(nn.Dense(256, dtype=self.dtype)(pose))
        h = nn.relu(nn.Dense(256, dtype=self.dtype)(h))
        f = jnp.concatenate([pts_feature, h], axis=-1)
        f = nn.relu(nn.Dense(256, dtype=self.dtype)(f))
        return nn.Dense(2, dtype=self.dtype)(f)
