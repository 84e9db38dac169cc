"""PointNet++ MSG classifier encoder, TPU-native.

Re-design of the reference ``networks/pts_encoder/pointnet2.py`` +
``pointnet2_modules.py`` + the CUDA ops:

- set-abstraction stage = Pallas FPS -> XLA gather -> ball query ->
  group -> SharedMLP (feature-dim Dense stacks on the MXU) -> max-pool;
- channels-LAST layout ``[B, N, C]`` throughout (vs the reference's
  ``[B, C, N]``) so every MLP is a lane-aligned matmul;
- the encoder config is passed explicitly (the reference reads a global CLI
  parse at ``pointnet2.py:13`` — a coupling bug we do not reproduce).

Configs transcribed from ``pointnet2.py:32-79``; the default released
checkpoints use ``ClsMSG_CFG_Light`` (``pointnet2.py:57-66``) giving a
1024-d global feature.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from genpose_tpu.models.layers import SharedMLP
from genpose_tpu.ops.pointcloud import (
    ball_query,
    farthest_point_sample,
    gather_points,
    group_points,
    three_nn,
    three_interpolate,
)

# Segmentation-style config (reference pointnet2.py:18-30).
MSG_CFG: Dict[str, Any] = {
    "NPOINTS": [512, 256, 128, 64],
    "RADIUS": [[0.01, 0.02], [0.02, 0.04], [0.04, 0.08], [0.08, 0.16]],
    "NSAMPLE": [[16, 32], [16, 32], [16, 32], [16, 32]],
    "MLPS": [
        [[16, 16, 32], [32, 32, 64]],
        [[64, 64, 128], [64, 96, 128]],
        [[128, 196, 256], [128, 196, 256]],
        [[256, 256, 512], [256, 384, 512]],
    ],
    "FP_MLPS": [[64, 64], [128, 128], [256, 256], [512, 512]],
    "CLS_FC": [128],
}

# Transcribed stage configs (reference pointnet2.py:32-79).
CLS_MSG_CONFIGS: Dict[str, Dict[str, Any]] = {
    "full": {  # ClsMSG_CFG (reference pointnet2.py:32-44): 5 stages
        "NPOINTS": [512, 256, 128, 64, None],
        "RADIUS": [[0.01, 0.02], [0.02, 0.04], [0.04, 0.08], [0.08, 0.16],
                   [None, None]],
        "NSAMPLE": [[16, 32], [16, 32], [16, 32], [16, 32], [None, None]],
        "MLPS": [
            [[16, 16, 32], [32, 32, 64]],
            [[64, 64, 128], [64, 96, 128]],
            [[128, 196, 256], [128, 196, 256]],
            [[256, 256, 512], [256, 384, 512]],
            [[512, 512], [512, 512]],
        ],
    },
    "light": {  # ClsMSG_CFG_Light — the default ("best before 29th April")
        "NPOINTS": [512, 256, 128, None],
        "RADIUS": [[0.02, 0.04], [0.04, 0.08], [0.08, 0.16], [None, None]],
        "NSAMPLE": [[16, 32], [16, 32], [16, 32], [None, None]],
        "MLPS": [
            [[16, 16, 32], [32, 32, 64]],
            [[64, 64, 128], [64, 96, 128]],
            [[128, 196, 256], [128, 196, 256]],
            [[256, 256, 512], [256, 384, 512]],
        ],
    },
    "lighter": {  # ClsMSG_CFG_Lighter
        "NPOINTS": [512, 256, 128, 64, None],
        "RADIUS": [[0.01], [0.02], [0.04], [0.08], [None]],
        "NSAMPLE": [[64], [32], [16], [8], [None]],
        "MLPS": [
            [[32, 32, 64]],
            [[64, 64, 128]],
            [[128, 196, 256]],
            [[256, 256, 512]],
            [[512, 512, 1024]],
        ],
    },
    "dense": {  # ClsMSG_CFG_Dense
        "NPOINTS": [512, 256, 128, None],
        "RADIUS": [[0.02, 0.04], [0.04, 0.08], [0.08, 0.16], [None, None]],
        "NSAMPLE": [[32, 64], [16, 32], [8, 16], [None, None]],
        "MLPS": [
            [[16, 16, 32], [32, 32, 64]],
            [[64, 64, 128], [64, 96, 128]],
            [[128, 196, 256], [128, 196, 256]],
            [[256, 256, 512], [256, 384, 512]],
        ],
    },
}


def sa_geometry(xyz, npoint, radii, nsamples, dtype=jnp.float32):
    """Weight-independent geometry of one SA stage.

    Everything here — FPS centers, per-radius ball-query indices, centered
    grouped coordinates — is a pure function of the input COORDINATES, not of
    any network parameter.  At inference the score net and the energy net
    encode the SAME point cloud with different weights, so a pipeline can
    compute this once and feed it to both encoders (see
    ``PoseAgent.pts_geometry``), halving the FPS/ball-query/grouping cost.

    ``dtype`` is the downstream COMPUTE dtype.  FPS, the ball query and
    ``new_xyz`` always run in f32 — index selection must stay bit-exact.
    For bf16 the value gather runs at a single MXU pass (3x faster than the
    6-pass f32 HIGHEST gather; see ``one_hot_gather``): the gathered
    coordinates come out bf16-rounded (f32-accumulated), the center is then
    subtracted in EXACT f32 and only the difference is cast to bf16 — one
    rounded operand instead of two, roughly halving the cancellation error
    on near-center offsets vs rounding both sides first.  (On non-TPU
    backends the gather is a take_along_axis of exact f32 values, so the
    bf16 result there is the cast of the exact difference.)

    Returns ``{"new_xyz", "gidx": [per radius], "grouped_xyz": [per radius]}``
    with ``new_xyz``/``gidx`` None for the GroupAll stage (npoint=None, ref
    ``pointnet2_utils.py:268-291``).
    """
    if npoint is None:
        return {"new_xyz": None, "gidx": [None for _ in radii],
                "grouped_xyz": [xyz.astype(dtype)[:, None, :, :]
                                for _ in radii]}
    idx = farthest_point_sample(xyz, npoint)
    new_xyz = gather_points(xyz, idx)  # [B, npoint, 3], f32
    fast = dtype != xyz.dtype
    prec = jax.lax.Precision.DEFAULT if fast else None
    gidx, grouped_xyz = [], []
    for radius, nsample in zip(radii, nsamples):
        gi = ball_query(radius, nsample, xyz, new_xyz)
        gidx.append(gi)
        g = group_points(xyz, gi, precision=prec) - new_xyz[:, :, None, :]
        grouped_xyz.append(g.astype(dtype))
    return {"new_xyz": new_xyz, "gidx": gidx, "grouped_xyz": grouped_xyz}


def stage_is_f32(k: int, n_stages: int, f32_stages: int) -> bool:
    """Does SA stage ``k`` (of ``n_stages``) run f32 under the
    ``encoder_f32_stages`` knob?

    ``f32_stages >= 0``: the FIRST N stages are f32 (prefix — the original
    bisection direction: early stages handle raw fine-grained coordinates).
    ``f32_stages < 0``: the LAST |N| stages are f32 (suffix — added round 4
    after the bisection showed GroupAll bf16 is the dominant cause of the
    bf16 rotation-learning failure, but f32 on the last TWO stages is
    required for full convergence: ``-1`` was the bisection probe and only
    partially converges, ``-2`` is the supported mixed config;
    BASELINE.md r4 sweep).
    """
    if f32_stages >= 0:
        return k < f32_stages
    return k >= n_stages + f32_stages


def cls_msg_geometry(pointcloud, config: str = "light", dtype=jnp.float32,
                     f32_stages: int = 0):
    """Per-stage :func:`sa_geometry` list for :class:`Pointnet2ClsMSG`.

    The coordinate chain (xyz -> FPS centers -> ...) never depends on
    features/weights, so the whole list is encoder-parameter-free.
    ``dtype`` must match the consuming encoders' compute dtype (see
    :func:`sa_geometry`); ``f32_stages`` mirrors the encoder's
    ``f32_stages`` (prefix/suffix per :func:`stage_is_f32`).
    """
    params = CLS_MSG_CONFIGS[config]
    n_stages = len(params["NPOINTS"])
    xyz = pointcloud[..., :3]
    geoms = []
    for k in range(n_stages):
        sdt = jnp.float32 if stage_is_f32(k, n_stages, f32_stages) else dtype
        g = sa_geometry(xyz, params["NPOINTS"][k], params["RADIUS"][k],
                        params["NSAMPLE"][k], dtype=sdt)
        geoms.append(g)
        xyz = g["new_xyz"]  # None after the final GroupAll stage
    return geoms


class PointnetSAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction (ref ``pointnet2_modules.py:10-93``).

    npoint=None means "group all" (final global stage, ref
    ``pointnet2_utils.py:268-291``).
    """

    npoint: Optional[int]
    radii: Sequence[Optional[float]]
    nsamples: Sequence[Optional[int]]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    use_bn: bool = True
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    # BatchNorm compute dtype for the SharedMLPs; None follows ``dtype``
    # (``bn_dtype`` config knob — f32 BN under bf16 compute)
    bn_dtype: Optional[jnp.dtype] = None
    # dtype of the inline sa_geometry (grouped coordinates); None follows
    # ``dtype`` (``geometry_dtype`` config knob — f32 exact gathers under
    # bf16 compute).  Precomputed ``geometry`` must be built with the SAME
    # dtype for the shared-geometry bit-exactness guarantee to hold.
    geometry_dtype: Optional[jnp.dtype] = None
    # single-MXU-pass scatter-add backward for the FEATURE gathers (forward
    # numerics unchanged; gradients bf16-rounded per contribution — see
    # ``ops/pointcloud.py::_row_gather_fast_bwd``)
    fast_grad_gathers: bool = False
    # single-MXU-pass FORWARD feature gathers while train=True (values
    # bf16-rounded, f32-accumulated) — perturbs the training loss, so only
    # enabled via the ``gather_fwd`` config knob; eval keeps the exact
    # dtype-aware default either way
    fast_fwd_gathers: bool = False

    @nn.compact
    def __call__(self, xyz, features, train: bool = False, geometry=None):
        """xyz: [B, N, 3]; features: [B, N, C] or None.

        ``geometry``: optional precomputed :func:`sa_geometry` result (shared
        across encoders); computed inline when None.  Bit-identical either way
        (gathers are exact; XLA CSEs the duplicated one-hot inline).

        Coordinates and features are deliberately gathered SEPARATELY: a
        fused one-hot gather of the concatenated [xyz | features] rows was
        measured 15% SLOWER end-to-end on the v5e train step (176 vs 153 ms
        at the reference config) — the width-3 f32 xyz gather takes a cheap
        lowering that fusing into the wide 6-pass HIGHEST matmul destroys.

        Returns (new_xyz [B, npoint, 3] or None, new_features [B, npoint, sum C_out]).
        """
        if geometry is None:
            gdt = self.dtype if self.geometry_dtype is None else self.geometry_dtype
            geometry = sa_geometry(xyz, self.npoint, self.radii, self.nsamples,
                                   dtype=gdt)
        new_xyz = geometry["new_xyz"]

        outs = []
        for i, mlp in enumerate(self.mlps):
            grouped_xyz = geometry["grouped_xyz"][i]
            if self.npoint is not None:
                if features is not None:
                    fwd_prec = (jax.lax.Precision.DEFAULT
                                if (self.fast_fwd_gathers and train) else None)
                    gf = group_points(features, geometry["gidx"][i],
                                      precision=fwd_prec,
                                      fast_bwd=self.fast_grad_gathers)
                    g = (jnp.concatenate([grouped_xyz, gf], axis=-1)
                         if self.use_xyz else gf)
                else:
                    g = grouped_xyz  # [B, npoint, nsample, 3]
            else:
                # GroupAll: one group containing every point.
                if features is not None:
                    g = (
                        jnp.concatenate([grouped_xyz, features[:, None]], axis=-1)
                        if self.use_xyz
                        else features[:, None]
                    )
                else:
                    g = grouped_xyz

            h = SharedMLP(
                tuple(mlp), use_bn=self.use_bn, bn_axis_name=self.bn_axis_name,
                dtype=self.dtype, bn_dtype=self.bn_dtype, name=f"mlp_{i}",
            )(g.astype(self.dtype), train=train)
            outs.append(jnp.max(h, axis=2))  # max-pool over the sample axis

        return new_xyz, jnp.concatenate(outs, axis=-1)


class PointnetFPModule(nn.Module):
    """Feature propagation via 3-NN inverse-distance interpolation
    (ref ``pointnet2_modules.py:117-158``).  Parity component for the
    segmentation-style path; not used by the classification encoder."""

    mlp: Sequence[int]
    use_bn: bool = True
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats, train: bool = False):
        if known is not None:
            dist, idx = three_nn(unknown, known)
            dist_recip = 1.0 / (dist + 1e-8)
            norm = jnp.sum(dist_recip, axis=-1, keepdims=True)
            weight = dist_recip / norm
            interpolated = three_interpolate(known_feats, idx, weight)
        else:
            interpolated = jnp.broadcast_to(
                known_feats, (known_feats.shape[0], unknown.shape[1], known_feats.shape[-1])
            )
        if unknown_feats is not None:
            new_features = jnp.concatenate([interpolated, unknown_feats], axis=-1)
        else:
            new_features = interpolated
        h = SharedMLP(tuple(self.mlp), use_bn=self.use_bn,
                      bn_axis_name=self.bn_axis_name, dtype=self.dtype)(
            new_features[:, :, None, :], train=train)
        return h[:, :, 0, :]


class Pointnet2MSG(nn.Module):
    """Segmentation-style SA+FP encoder -> per-point scores
    (ref ``pointnet2.py:92-163``).  Capability-parity component: the
    reference's version is dead code (live ``set_trace`` at line 157) and is
    not used by GenPose's default classification path.

    Returns per-point features [B, N, FP_MLPS[0][-1]]; with ``cls_head``
    also the [B, N, 1] per-point logit the reference's ``cls_layer``
    produces.
    """

    input_channels: int = 0
    use_bn: bool = True
    bn_axis_name: Optional[str] = None
    cls_head: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pointcloud, train: bool = False):
        xyz = pointcloud[..., :3]
        features = pointcloud[..., 3:] if pointcloud.shape[-1] > 3 else None

        l_xyz, l_features = [xyz], [features]
        for k in range(len(MSG_CFG["NPOINTS"])):
            xyz_k, feat_k = PointnetSAModuleMSG(
                npoint=MSG_CFG["NPOINTS"][k],
                radii=tuple(MSG_CFG["RADIUS"][k]),
                nsamples=tuple(MSG_CFG["NSAMPLE"][k]),
                mlps=tuple(tuple(m) for m in MSG_CFG["MLPS"][k]),
                use_xyz=True,
                use_bn=self.use_bn,
                bn_axis_name=self.bn_axis_name,
                dtype=self.dtype,
                name=f"sa_{k}",
            )(l_xyz[-1], l_features[-1], train=train)
            l_xyz.append(xyz_k)
            l_features.append(feat_k)

        n_fp = len(MSG_CFG["FP_MLPS"])
        for i in range(-1, -(n_fp + 1), -1):
            l_features[i - 1] = PointnetFPModule(
                mlp=tuple(MSG_CFG["FP_MLPS"][n_fp + i]),
                use_bn=self.use_bn,
                bn_axis_name=self.bn_axis_name,
                dtype=self.dtype,
                name=f"fp_{n_fp + i}",
            )(l_xyz[i - 1], l_xyz[i], l_features[i - 1], l_features[i],
              train=train)

        per_point = l_features[0]  # [B, N, FP_MLPS[0][-1]]
        if not self.cls_head:
            return per_point
        h = per_point
        for j, width in enumerate(MSG_CFG["CLS_FC"]):
            h = SharedMLP((width,), use_bn=self.use_bn,
                          bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                          name=f"cls_{j}")(h[:, :, None, :], train=train)[:, :, 0]
            # dropout only when training AND the caller supplied a 'dropout'
            # rng (apply(..., rngs={'dropout': key})); deterministic otherwise
            use_dropout = train and self.has_rng("dropout")
            h = nn.Dropout(0.5, deterministic=not use_dropout)(h)
        logit = nn.Dense(1, dtype=self.dtype, name="cls_out")(h)
        return per_point, logit


class Pointnet2ClsMSG(nn.Module):
    """4-stage MSG classification encoder -> 1024-d global feature
    (ref ``pointnet2.py:166-211``).

    input_channels counts EXTRA per-point features beyond xyz (0 for GenPose).
    """

    input_channels: int = 0
    config: str = "light"
    use_bn: bool = True
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    bn_dtype: Optional[jnp.dtype] = None  # see PointnetSAModuleMSG
    geometry_dtype: Optional[jnp.dtype] = None  # see PointnetSAModuleMSG
    # run the FIRST N (>=0) or LAST |N| (<0) SA stages fully in f32
    # (matmuls + inline geometry unless geometry_dtype overrides) — the
    # bf16-training bisection knob (``encoder_f32_stages`` config; see
    # :func:`stage_is_f32`)
    f32_stages: int = 0
    fast_grad_gathers: bool = False  # see PointnetSAModuleMSG
    fast_fwd_gathers: bool = False  # see PointnetSAModuleMSG

    @nn.compact
    def __call__(self, pointcloud, train: bool = False, geometry=None):
        """pointcloud: [B, N, 3 + input_channels] -> [B, 1024].

        ``geometry``: optional precomputed :func:`cls_msg_geometry` list
        (weight-independent; shareable across encoders on the same cloud).
        """
        params = CLS_MSG_CONFIGS[self.config]
        xyz = pointcloud[..., :3]
        features = pointcloud[..., 3:] if pointcloud.shape[-1] > 3 else None

        n_stages = len(params["NPOINTS"])
        for k in range(n_stages):
            mlps: List[List[int]] = [list(m) for m in params["MLPS"][k]]
            sdt = (jnp.float32
                   if stage_is_f32(k, n_stages, self.f32_stages)
                   else self.dtype)
            xyz_new, features = PointnetSAModuleMSG(
                npoint=params["NPOINTS"][k],
                radii=tuple(params["RADIUS"][k]),
                nsamples=tuple(params["NSAMPLE"][k]),
                mlps=tuple(tuple(m) for m in mlps),
                use_xyz=True,
                use_bn=self.use_bn,
                bn_axis_name=self.bn_axis_name,
                dtype=sdt,
                bn_dtype=self.bn_dtype,
                geometry_dtype=(self.geometry_dtype
                                if self.geometry_dtype is not None else sdt),
                fast_grad_gathers=self.fast_grad_gathers,
                fast_fwd_gathers=self.fast_fwd_gathers,
                name=f"sa_{k}",
            )(xyz, features, train=train,
              geometry=None if geometry is None else geometry[k])
            xyz = xyz_new

        # final stage has npoint None -> [B, 1, C]; squeeze like the
        # reference's ``l_features[-1].squeeze(-1)`` (pointnet2.py:211)
        return features[:, 0, :]
