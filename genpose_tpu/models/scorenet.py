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
    FusedTails,
    GaussianFourierProjection,
    PerPointTail,
    PositionalEmbedding,
    SplitTail,
)
from genpose_tpu.ops.pose import get_pose_dim


def _tail_specs(regression_head: str, pose_dim: int):
    """(name, hidden, out_dim) per fusion tail (ref ``scorenet.py:118-176``)."""
    if regression_head == "RT":
        return (("tail", 512, pose_dim),)
    if regression_head == "R_and_T":
        return (("tail_rot", 256, pose_dim - 3), ("tail_trans", 256, 3))
    if regression_head == "Rx_Ry_and_T":
        return (("tail_rot_x", 256, 3), ("tail_rot_y", 256, 3),
                ("tail_trans", 256, 3))
    raise NotImplementedError(regression_head)


# Tail-bank plumbing shared by PoseTrunk (score/energy) and PoseDecoderNet
# (EDM): identical tail shapes fuse into one wide matmul bank, otherwise a
# list of split tails; ``precompute``/``from_proj`` hoist the loop-invariant
# pts_feat projections out of sampler step scans.

def _make_tail_bank(specs, dtype):
    if len({(h, o) for _, h, o in specs}) == 1:
        return FusedTails(num_tails=len(specs), hidden=specs[0][1],
                          out_dim=specs[0][2], dtype=dtype, name="tails")
    return [SplitTail(hidden, out_dim, dtype=dtype, name=name)
            for name, hidden, out_dim in specs]


def _tail_bank_precompute(tails, pts_feat):
    if isinstance(tails, FusedTails):
        return tails.precompute(pts_feat)
    return tuple(tail.precompute(pts_feat) for tail in tails)


def _tail_bank_from_proj(tails, projs, embed_feat, pose_feat):
    """embed_feat (the t/sigma embedding) may be a step-shared [1, C] row —
    it broadcasts through the fused bank, or is materialized for the split
    tails' concat."""
    if isinstance(tails, FusedTails):
        return tails.from_proj(projs, embed_feat, pose_feat)
    if embed_feat.shape[0] != pose_feat.shape[0]:
        embed_feat = jnp.broadcast_to(
            embed_feat, (pose_feat.shape[0], embed_feat.shape[1]))
    dyn_feat = jnp.concatenate([embed_feat, pose_feat], axis=-1)
    return jnp.concatenate(
        [tail.from_proj(fp, dyn_feat) for tail, fp in zip(tails, projs)],
        axis=-1,
    )


class PoseTrunk(nn.Module):
    """Shared (t, pose) conditioning trunk + split fusion tails.

    Used by both the score and energy heads; exposes ``precompute`` so
    samplers can hoist the pts_feat projections out of their step scan
    (see ``SplitTail``).
    """

    pose_mode: str = "rot_matrix"
    regression_head: str = "Rx_Ry_and_T"
    # per-point variant: pts_feat is [bs, N, pts_feat_dim] and the tails are
    # RotHead/TransHead decoder heads (ref ``scorenet.py:86,146-149,198-204``)
    per_point_feature: bool = False
    pts_feat_dim: int = 1280
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        pose_dim = get_pose_dim(self.pose_mode)
        if self.regression_head == "Rx_Ry_and_T" and self.pose_mode != "rot_matrix":
            raise NotImplementedError("Rx_Ry_and_T requires rot_matrix pose mode")
        self.t_fourier = GaussianFourierProjection(embed_dim=128, name="t_fourier")
        self.t_dense = nn.Dense(128, dtype=self.dtype, name="t_dense")
        self.pose_dense_0 = nn.Dense(256, dtype=self.dtype, name="pose_dense_0")
        self.pose_dense_1 = nn.Dense(256, dtype=self.dtype, name="pose_dense_1")
        specs = _tail_specs(self.regression_head, pose_dim)
        if self.per_point_feature:
            # the reference wires per-point heads only for Rx_Ry_and_T
            # (scorenet.py:146-149); other heads raise there too
            if self.regression_head != "Rx_Ry_and_T":
                raise NotImplementedError(
                    "per_point_feature requires Rx_Ry_and_T")
            self.tails = [
                PerPointTail(pts_dim=self.pts_feat_dim, out_dim=out_dim,
                             dtype=self.dtype, name=name)
                for name, _, out_dim in specs
            ]
        else:
            self.tails = _make_tail_bank(specs, self.dtype)

    def precompute(self, pts_feat):
        """Loop-invariant tail projections of pts_feat."""
        return _tail_bank_precompute(self.tails, pts_feat)

    def f_theta_from(self, projs, sampled_pose, t, train: bool = False):
        """Head output given precomputed projections.

        t may be [N, 1] (training/energy) or [1, 1] (samplers — t is shared
        across the batch within one step and broadcasts through the fused
        bank instead of being recomputed per row).
        """
        t_feat = nn.relu(self.t_dense(self.t_fourier(t[:, 0])))
        pose_feat = nn.relu(self.pose_dense_0(sampled_pose))
        pose_feat = nn.relu(self.pose_dense_1(pose_feat))
        if self.per_point_feature:
            use_drop = self.has_rng("dropout")
            return jnp.concatenate(
                [tail.from_proj(fp, t_feat, pose_feat, train=train,
                                use_dropout_rng=use_drop)
                 for tail, fp in zip(self.tails, projs)],
                axis=-1,
            )
        return _tail_bank_from_proj(self.tails, projs, t_feat, pose_feat)

    def __call__(self, pts_feat, sampled_pose, t, train: bool = False):
        return self.f_theta_from(self.precompute(pts_feat), sampled_pose, t,
                                 train=train)


class PoseScoreNet(nn.Module):
    marginal_prob_fn: Callable  # (x, t) -> (mean, std); static closure
    pose_mode: str = "rot_matrix"
    regression_head: str = "Rx_Ry_and_T"
    # per-point variant (ref ``scorenet.py:86``): pts_feat is per-point
    # [bs, N, pts_feat_dim] and the tails are RotHead/TransHead decoder
    # heads.  Selectable like the reference's ``per_point_feature`` flag
    # (the reference's composite model hardcodes it off, ``posenet.py:57``).
    per_point_feature: bool = False
    pts_feat_dim: int = 1280
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.trunk = PoseTrunk(pose_mode=self.pose_mode,
                               regression_head=self.regression_head,
                               per_point_feature=self.per_point_feature,
                               pts_feat_dim=self.pts_feat_dim,
                               dtype=self.dtype, name="trunk")

    def precompute(self, pts_feat):
        return self.trunk.precompute(pts_feat)

    def score_from(self, projs, sampled_pose, t, train: bool = False):
        _, std = self.marginal_prob_fn(None, t)
        std = jnp.reshape(std, (-1, 1))
        f_theta = self.trunk.f_theta_from(projs, sampled_pose, t, train=train)
        return f_theta / (std + 1e-7)

    def __call__(self, pts_feat, sampled_pose, t, train: bool = False):
        """pts_feat [bs, 1024] (or [bs, N, pts_feat_dim] per-point);
        sampled_pose [bs, pose_dim]; t [bs, 1] -> score."""
        return self.score_from(self.precompute(pts_feat), sampled_pose, t,
                               train=train)


class PoseDecoderNet(nn.Module):
    """EDM-style denoiser head ``D(x, sigma) = x + sigma * f_theta(x, sigma)``
    (ref ``scorenet.py:225-364``, using the VE-style scaling branch the
    reference keeps active: c_skip=1, c_out=sigma, c_in=1,
    c_noise=log(sigma/2); its Karras-EDM scalings are commented out there).

    Same concat order ``[pts_feat, sigma_feat, pose_feat]`` and tail shapes
    as :class:`PoseScoreNet` (``scorenet.py:344-346``), so the tails reuse
    ``FusedTails``/``SplitTail`` and samplers hoist the loop-invariant
    pts_feat projections via :meth:`precompute`/:meth:`denoise_from` —
    mirroring the score net's pattern.
    """

    marginal_prob_fn: Callable  # (x, t) -> (mean, std); std == t for EDM
    sigma_data: float = 1.4148  # ref signature parity; unused by VE scaling
    pose_mode: str = "rot_matrix"
    regression_head: str = "Rx_Ry_and_T"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        pose_dim = get_pose_dim(self.pose_mode)
        self.sigma_embed = PositionalEmbedding(num_channels=128,
                                               name="sigma_embed")
        self.sigma_dense = nn.Dense(128, dtype=self.dtype, name="sigma_dense")
        self.pose_dense_0 = nn.Dense(256, dtype=self.dtype, name="pose_dense_0")
        self.pose_dense_1 = nn.Dense(256, dtype=self.dtype, name="pose_dense_1")
        self.tails = _make_tail_bank(
            _tail_specs(self.regression_head, pose_dim), self.dtype)

    def precompute(self, pts_feat):
        """Loop-invariant tail projections of pts_feat."""
        return _tail_bank_precompute(self.tails, pts_feat)

    def _f_theta_from(self, projs, sampled_pose, t):
        _, sigma_t = self.marginal_prob_fn(None, t)
        sigma_t = jnp.reshape(sigma_t, (-1, 1))
        c_noise = jnp.log(sigma_t / 2.0)
        sig_feat = nn.relu(self.sigma_dense(self.sigma_embed(c_noise[:, 0])))
        pose_feat = nn.relu(self.pose_dense_0(sampled_pose))
        pose_feat = nn.relu(self.pose_dense_1(pose_feat))
        return sigma_t, _tail_bank_from_proj(self.tails, projs, sig_feat,
                                             pose_feat)

    def denoise_from(self, projs, sampled_pose, t):
        """Denoised pose given precomputed projections; t may be [N,1] or a
        step-shared [1,1] (broadcasts like the score trunk)."""
        sigma_t, f = self._f_theta_from(projs, sampled_pose, t)
        return sampled_pose + sigma_t * f  # c_skip*x + c_out*f

    def score_from(self, projs, sampled_pose, t):
        """Score of the implied marginal: s = (D - x)/sigma^2 = f/sigma —
        lets the generic PF-ODE/PC samplers drive a denoiser head."""
        sigma_t, f = self._f_theta_from(projs, sampled_pose, t)
        return f / sigma_t

    def __call__(self, pts_feat, sampled_pose, t, train: bool = False):
        return self.denoise_from(self.precompute(pts_feat), sampled_pose, t)
