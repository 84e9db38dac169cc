"""Pose score network (ref ``networks/gf_algorithms/scorenet.py:85-222``).

MLP conditioned on (pts_feat [1024], pose [pose_dim], t):

- pose encoder pose_dim->256->256 (ReLU),
- GaussianFourier t-embedding 128 -> Dense 128 + ReLU,
- concat [pts_feat, t_feat, pose_feat] (order matters for weight porting:
  ``scorenet.py:204``),
- regression heads with ZERO-initialized last layers, output divided by
  sigma(t)+1e-7 (``scorenet.py:205-217``).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn

from genpose_tpu.models.layers import (
    GaussianFourierProjection,
    PositionalEmbedding,
    zero_dense,
)
from genpose_tpu.ops.pose import get_pose_dim


class PoseScoreNet(nn.Module):
    marginal_prob_fn: Callable  # (x, t) -> (mean, std); static closure
    pose_mode: str = "rot_matrix"
    regression_head: str = "Rx_Ry_and_T"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pts_feat, sampled_pose, t):
        """pts_feat [bs, 1024]; sampled_pose [bs, pose_dim]; t [bs, 1] -> score."""
        pose_dim = get_pose_dim(self.pose_mode)

        t_feat = GaussianFourierProjection(embed_dim=128, name="t_fourier")(t[:, 0])
        t_feat = nn.relu(nn.Dense(128, dtype=self.dtype, name="t_dense")(t_feat))

        pose_feat = nn.relu(nn.Dense(256, dtype=self.dtype, name="pose_dense_0")(sampled_pose))
        pose_feat = nn.relu(nn.Dense(256, dtype=self.dtype, name="pose_dense_1")(pose_feat))

        total_feat = jnp.concatenate([pts_feat, t_feat, pose_feat], axis=-1)
        _, std = self.marginal_prob_fn(None, t)
        std = jnp.reshape(std, (-1, 1))

        if self.regression_head == "RT":
            h = nn.relu(nn.Dense(512, dtype=self.dtype, name="tail_dense")(total_feat))
            out = zero_dense(pose_dim, name="tail_out", dtype=self.dtype)(h)
        elif self.regression_head == "R_and_T":
            hr = nn.relu(nn.Dense(256, dtype=self.dtype, name="tail_rot_dense")(total_feat))
            rot = zero_dense(pose_dim - 3, name="tail_rot_out", dtype=self.dtype)(hr)
            ht = nn.relu(nn.Dense(256, dtype=self.dtype, name="tail_trans_dense")(total_feat))
            trans = zero_dense(3, name="tail_trans_out", dtype=self.dtype)(ht)
            out = jnp.concatenate([rot, trans], axis=-1)
        elif self.regression_head == "Rx_Ry_and_T":
            if self.pose_mode != "rot_matrix":
                raise NotImplementedError("Rx_Ry_and_T requires rot_matrix pose mode")
            hx = nn.relu(nn.Dense(256, dtype=self.dtype, name="tail_rot_x_dense")(total_feat))
            rot_x = zero_dense(3, name="tail_rot_x_out", dtype=self.dtype)(hx)
            hy = nn.relu(nn.Dense(256, dtype=self.dtype, name="tail_rot_y_dense")(total_feat))
            rot_y = zero_dense(3, name="tail_rot_y_out", dtype=self.dtype)(hy)
            ht = nn.relu(nn.Dense(256, dtype=self.dtype, name="tail_trans_dense")(total_feat))
            trans = zero_dense(3, name="tail_trans_out", dtype=self.dtype)(ht)
            out = jnp.concatenate([rot_x, rot_y, trans], axis=-1)
        else:
            raise NotImplementedError(self.regression_head)

        return out / (std + 1e-7)


class PoseDecoderNet(nn.Module):
    """EDM-style denoiser head (ref ``scorenet.py:225-364``; unused by the
    default config but part of the capability surface)."""

    marginal_prob_fn: Callable
    sigma_data: float = 1.4148
    pose_mode: str = "rot_matrix"
    regression_head: str = "Rx_Ry_and_T"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pts_feat, sampled_pose, t):
        pose_dim = get_pose_dim(self.pose_mode)
        _, sigma_t = self.marginal_prob_fn(None, t)
        sigma_t = jnp.reshape(sigma_t, (-1, 1))

        # VE-style scaling (ref scorenet.py:337-341)
        c_skip, c_out, c_in = 1.0, sigma_t, 1.0
        c_noise = jnp.log(sigma_t / 2.0)

        pose_feat = nn.relu(nn.Dense(256, dtype=self.dtype)(sampled_pose * c_in))
        pose_feat = nn.relu(nn.Dense(256, dtype=self.dtype)(pose_feat))
        sig_feat = PositionalEmbedding(num_channels=128)(c_noise[:, 0])
        sig_feat = nn.relu(nn.Dense(128, dtype=self.dtype)(sig_feat))
        total_feat = jnp.concatenate([pts_feat, sig_feat, pose_feat], axis=-1)

        if self.regression_head == "RT":
            h = nn.relu(nn.Dense(512, dtype=self.dtype)(total_feat))
            out = zero_dense(pose_dim, dtype=self.dtype)(h)
        elif self.regression_head == "Rx_Ry_and_T":
            hx = nn.relu(nn.Dense(256, dtype=self.dtype)(total_feat))
            rx = zero_dense(3, dtype=self.dtype)(hx)
            hy = nn.relu(nn.Dense(256, dtype=self.dtype)(total_feat))
            ry = zero_dense(3, dtype=self.dtype)(hy)
            ht = nn.relu(nn.Dense(256, dtype=self.dtype)(total_feat))
            tr = zero_dense(3, dtype=self.dtype)(ht)
            out = jnp.concatenate([rx, ry, tr], axis=-1)
        else:
            raise NotImplementedError(self.regression_head)

        return c_skip * sampled_pose + c_out * out
