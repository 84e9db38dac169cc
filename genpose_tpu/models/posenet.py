"""GFObjectPose: encoder + score-or-energy head multiplexer.

Re-design of reference ``networks/posenet.py:18-179``.  The torch version
dispatches on a string ``mode`` inside ``forward``; in JAX the natural shape
is a flax module exposing *methods* (``encode_pts``, ``score``, ``energy``)
plus pure-function factories (:func:`make_score_fn`, :func:`make_energy_fn`)
that close over the variables — samplers and training steps compose those
callables and stay jittable end to end.

The energy net's score is ``jax.grad`` of the summed scalar energy w.r.t. the
pose input (reference used ``torch.autograd.grad`` with ones grad_outputs,
``energynet.py:210-215``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from genpose_tpu.models.energynet import PoseEnergyNet
from genpose_tpu.models.pointnet import PointNetfeat
from genpose_tpu.models.pointnet2 import Pointnet2ClsMSG
from genpose_tpu.models.scorenet import PoseDecoderNet, PoseScoreNet


class GFObjectPose(nn.Module):
    """Composite model (ref ``posenet.py:18-68``).

    Attributes mirror the reference cfg fields used to build the net.
    """

    marginal_prob_fn: Callable
    pose_mode: str = "rot_matrix"
    regression_head: str = "Rx_Ry_and_T"
    posenet_mode: str = "score"  # 'score' | 'energy'
    pts_encoder: str = "pointnet2"  # 'pointnet' | 'pointnet2' | 'pointnet_and_pointnet2'
    pointnet2_params: str = "light"
    num_points: int = 1024
    energy_mode: str = "IP"
    s_theta_mode: str = "score"
    norm_energy: str = "identical"
    # EDM denoiser head (sde_mode='edm'): the reference sketches this wiring
    # at ``posenet.py:49-56`` (commented out there); here it is first-class.
    decoder_head: bool = False
    bn_axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32
    # BatchNorm compute dtype inside the PointNet++ SharedMLPs; None follows
    # ``dtype`` (``bn_dtype`` config knob — f32 BN under bf16 compute; r4
    # mixed-precision sweep, BASELINE.md).
    bn_dtype: jnp.dtype | None = None
    # dtype of the PointNet++ grouped-coordinate geometry; None follows
    # ``dtype`` (``geometry_dtype`` config knob).  Must match the dtype any
    # PRECOMPUTED geometry was built with (``PoseAgent.pts_geometry`` keeps
    # them in sync).
    geometry_dtype: jnp.dtype | None = None
    # first N PointNet++ SA stages fully f32 (``encoder_f32_stages`` knob)
    f32_stages: int = 0
    # Compute dtype for the pose/time heads; None = follow ``dtype``.
    # Added while investigating bf16 mixed-precision TRAINING: all-bf16
    # training stalls rotation learning at full model size (on-chip check:
    # DSM plateaus at ~3.0, rot 124°->126° after 3k steps, vs 1.4 / 33° in
    # f32), and f32 heads alone do NOT rescue it — f32 remains the
    # supported training precision (BASELINE.md r3).  Serving keeps bf16
    # heads (the sampler stage is entirely head evaluations; accuracy is
    # pinned by tests/test_bf16.py).
    head_dtype: jnp.dtype | None = None
    # Training-only: single-pass scatter-add backward for the encoder's
    # feature gathers (see ``ops/pointcloud.py::_row_gather_fast_bwd``).
    fast_grad_gathers: bool = False
    # Training-only (train=True): single-pass FORWARD feature gathers
    # (``gather_fwd`` config knob; eval numerics untouched).
    fast_fwd_gathers: bool = False

    def setup(self):
        hdt = self.dtype if self.head_dtype is None else self.head_dtype
        if self.pts_encoder == "pointnet":
            self.encoder = PointNetfeat(in_dim=3, out_dim=1024, dtype=self.dtype)
        elif self.pts_encoder == "pointnet2":
            self.encoder = Pointnet2ClsMSG(
                input_channels=0, config=self.pointnet2_params,
                bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                bn_dtype=self.bn_dtype, geometry_dtype=self.geometry_dtype,
                f32_stages=self.f32_stages,
                fast_grad_gathers=self.fast_grad_gathers,
                fast_fwd_gathers=self.fast_fwd_gathers)
        elif self.pts_encoder == "pointnet_and_pointnet2":
            self.encoder_pn = PointNetfeat(in_dim=3, out_dim=1024, dtype=self.dtype)
            self.encoder_pn2 = Pointnet2ClsMSG(
                input_channels=0, config=self.pointnet2_params,
                bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                bn_dtype=self.bn_dtype, geometry_dtype=self.geometry_dtype,
                f32_stages=self.f32_stages,
                fast_grad_gathers=self.fast_grad_gathers,
                fast_fwd_gathers=self.fast_fwd_gathers)
            self.fusion_layer = nn.Dense(1024, dtype=self.dtype)
        else:
            raise NotImplementedError(self.pts_encoder)

        if self.posenet_mode == "score":
            if self.decoder_head:
                self.head = PoseDecoderNet(
                    marginal_prob_fn=self.marginal_prob_fn,
                    pose_mode=self.pose_mode,
                    regression_head=self.regression_head,
                    dtype=hdt,
                )
            else:
                self.head = PoseScoreNet(
                    marginal_prob_fn=self.marginal_prob_fn,
                    pose_mode=self.pose_mode,
                    regression_head=self.regression_head,
                    dtype=hdt,
                )
        elif self.posenet_mode == "energy":
            self.head = PoseEnergyNet(
                marginal_prob_fn=self.marginal_prob_fn,
                pose_mode=self.pose_mode,
                regression_head=self.regression_head,
                energy_mode=self.energy_mode,
                s_theta_mode=self.s_theta_mode,
                norm_energy=self.norm_energy,
                dtype=hdt,
            )
        else:
            raise NotImplementedError(self.posenet_mode)

    def encode_pts(self, pts, train: bool = False, geometry=None):
        """pts [bs, N, 3] -> pts_feat [bs, 1024] (ref ``posenet.py:71-91``).

        ``geometry``: optional precomputed ``cls_msg_geometry`` list for the
        PointNet++ stages (weight-independent — a pipeline running several
        encoders on the same cloud computes it once; see
        ``PoseAgent.pts_geometry``).  Ignored by the plain PointNet encoder.
        """
        if self.pts_encoder == "pointnet":
            return self.encoder(pts, train=train)
        if self.pts_encoder == "pointnet2":
            return self.encoder(pts, train=train, geometry=geometry)
        feat = jnp.concatenate(
            [self.encoder_pn(pts, train=train),
             self.encoder_pn2(pts, train=train, geometry=geometry)],
            axis=-1,
        )
        return nn.relu(self.fusion_layer(feat))

    def score(self, pts_feat, sampled_pose, t):
        """Score head (score mode only).  For the EDM decoder head the score
        is derived from the denoiser: s = (D - x)/sigma^2."""
        assert self.posenet_mode == "score"
        if self.decoder_head:
            return self.head.score_from(self.head.precompute(pts_feat),
                                        sampled_pose, t)
        return self.head(pts_feat, sampled_pose, t)

    def denoise(self, pts_feat, sampled_pose, t):
        """EDM denoiser D(x, sigma) (decoder head only)."""
        assert self.posenet_mode == "score" and self.decoder_head
        return self.head(pts_feat, sampled_pose, t)

    def denoise_with(self, projs, sampled_pose, t):
        assert self.posenet_mode == "score" and self.decoder_head
        return self.head.denoise_from(projs, sampled_pose, t)

    def energy(self, pts_feat, sampled_pose, t, decoupled_rt: bool = True):
        """Energy head (energy mode only)."""
        assert self.posenet_mode == "energy"
        return self.head(pts_feat, sampled_pose, t, decoupled_rt=decoupled_rt)

    def precompute_head(self, pts_feat):
        """Loop-invariant tail projections of pts_feat — compute once per
        sampler call, pass to ``score_with``/``energy_with`` every step."""
        return self.head.precompute(pts_feat)

    def score_with(self, projs, sampled_pose, t):
        assert self.posenet_mode == "score"
        return self.head.score_from(projs, sampled_pose, t)

    def energy_with(self, projs, sampled_pose, t, decoupled_rt: bool = True):
        assert self.posenet_mode == "energy"
        return self.head.energy_from(projs, sampled_pose, t,
                                     decoupled_rt=decoupled_rt)

    def __call__(self, pts, sampled_pose, t, train: bool = False):
        """Init/forward convenience: encode + head (used for variable init)."""
        pts_feat = self.encode_pts(pts, train=train)
        if self.posenet_mode == "score":
            return self.score(pts_feat, sampled_pose, t)
        return self.energy(pts_feat, sampled_pose, t)


# ---------------------------------------------------------------------------
# Pure-function factories
# ---------------------------------------------------------------------------

def make_encode_fn(model: GFObjectPose, variables) -> Callable:
    """pts [bs, N, 3] -> pts_feat [bs, 1024] in eval mode (running BN stats)."""

    def encode_fn(pts):
        return model.apply(variables, pts, train=False, method=GFObjectPose.encode_pts)

    return encode_fn


def make_score_fn(model: GFObjectPose, variables) -> Callable:
    """Returns score_fn(pts_feat, pose, t) -> score [bs, pose_dim].

    For energy models the score is grad of summed energy w.r.t. pose
    (ref ``energynet.py:210-215``).
    """
    if model.posenet_mode == "score":

        def score_fn(pts_feat, pose, t):
            return model.apply(variables, pts_feat, pose, t,
                               method=GFObjectPose.score)

    else:

        def score_fn(pts_feat, pose, t):
            def energy_sum(p):
                e = model.apply(variables, pts_feat, p, t, decoupled_rt=False,
                                method=GFObjectPose.energy)
                return jnp.sum(e)

            return jax.grad(energy_sum)(pose)

    return score_fn


def make_energy_fn(model: GFObjectPose, variables, decoupled_rt: bool = True) -> Callable:
    def energy_fn(pts_feat, pose, t):
        return model.apply(variables, pts_feat, pose, t, decoupled_rt=decoupled_rt,
                           method=GFObjectPose.energy)

    return energy_fn
