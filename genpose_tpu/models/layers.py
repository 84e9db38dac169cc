"""Shared flax layers.

Replaces ``networks/gf_algorithms/scorenet.py:13-80`` (zero_module,
GaussianFourierProjection) and ``pointnet2/pytorch_utils.py`` (SharedMLP -
1x1 Conv2d+BN+ReLU stacks, which on TPU are plain feature-dim Dense layers
riding the MXU).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def zero_dense(features: int, name: str | None = None, dtype=jnp.float32) -> nn.Dense:
    """Dense with zero-initialized kernel AND bias — the reference zeroes the
    last layer of every score tail so training starts from score=0
    (``scorenet.py:13-19`` ``zero_module``)."""
    return nn.Dense(
        features,
        kernel_init=nn.initializers.zeros,
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        name=name,
    )


class GaussianFourierProjection(nn.Module):
    """Gaussian random features for time embedding (ref ``scorenet.py:55-64``).

    W ~ N(0, scale^2), fixed during optimization.  Stored as a parameter with
    ``stop_gradient`` applied so it is checkpointed but never updated.
    """

    embed_dim: int = 128
    scale: float = 30.0

    @nn.compact
    def __call__(self, t):
        # t: [bs] -> [bs, embed_dim]
        W = self.param(
            "W",
            lambda key, shape: jax.random.normal(key, shape) * self.scale,
            (self.embed_dim // 2,),
        )
        W = jax.lax.stop_gradient(W)
        x_proj = t[:, None] * W[None, :] * 2 * jnp.pi
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


class PositionalEmbedding(nn.Module):
    """Sinusoidal embedding for the EDM decoder head (ref ``scorenet.py:67-80``)."""

    num_channels: int = 128
    max_positions: int = 10000
    endpoint: bool = False

    @nn.compact
    def __call__(self, x):
        half = self.num_channels // 2
        freqs = jnp.arange(half, dtype=jnp.float32)
        freqs = freqs / (half - (1 if self.endpoint else 0))
        freqs = (1.0 / self.max_positions) ** freqs
        x = x[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.cos(x), jnp.sin(x)], axis=-1)


class TorchBatchNorm(nn.Module):
    """flax ``nn.BatchNorm`` with torch's running-variance update semantics.

    Identical to ``nn.BatchNorm`` (same params/batch_stats layout and names,
    f32 statistics + normalization with the BIASED batch variance, output cast
    to ``dtype``) except the running_var update uses the UNBIASED variance
    (Bessel factor n/(n-1)) exactly as ``torch.nn.BatchNorm1d/2d`` — the
    reference's BN stacks (``pytorch_utils.py:5-33``, torch ``F.batch_norm``)
    normalize with the biased variance but track the unbiased one.  flax
    tracks the biased variance, which drifts eval-time numerics from a
    torch-trained twin by var/(n-1) per update (0.5x at the bs=2 parity-test
    shapes).  Train-mode outputs and the parameter trajectory are untouched
    (normalization never reads the running stats under train=True).
    Pinned by ``tests/test_training_parity.py`` (composed update-trajectory
    golden test vs the running reference).
    """

    use_running_average: bool | None = None
    momentum: float = 0.99
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        from flax.linen import module as _fm
        from flax.linen import normalization as _nrm

        use_running_average = _fm.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        feature_axes = _nrm._canonicalize_axes(x.ndim, -1)
        reduction_axes = tuple(i for i in range(x.ndim)
                               if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]

        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32),
                                feature_shape)
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32),
                               feature_shape)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axis_name = (self.axis_name
                         if not self.is_initializing() else None)
            mean, var = _nrm._compute_stats(
                x, reduction_axes, dtype=self.dtype, axis_name=axis_name,
                use_fast_variance=True, force_float32_reductions=True)
            if not self.is_initializing():
                n = 1
                for ax in reduction_axes:
                    n *= x.shape[ax]
                if axis_name is not None:  # pmap/shard_map: global count
                    n = n * jax.lax.psum(1, axis_name)
                bessel = n / jnp.maximum(n - 1, 1).astype(jnp.float32) \
                    if not isinstance(n, int) else n / max(n - 1, 1)
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var * bessel

        return _nrm._normalize(
            self, x, mean, var, reduction_axes, feature_axes, self.dtype,
            self.param_dtype, self.epsilon, use_bias=True, use_scale=True,
            bias_init=nn.initializers.zeros, scale_init=nn.initializers.ones,
            force_float32_reductions=True)


class SharedMLP(nn.Module):
    """Per-point MLP: Dense + BN + ReLU stacks over the trailing feature dim.

    Equivalent to the reference's 1x1 ``Conv2d``+``BatchNorm2d``+ReLU
    ``SharedMLP`` (``pytorch_utils.py:5-33``) applied to channels-last
    ``[B, npoint, nsample, C]`` tensors: a 1x1 conv IS a feature-dim matmul,
    which is exactly what the MXU wants.
    """

    features: Sequence[int]
    use_bn: bool = True
    bn_axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32
    # BatchNorm compute dtype; None follows ``dtype``.  jnp.float32 runs the
    # normalization (statistics + scale/shift) in f32 and casts the result
    # back to ``dtype`` — mixed-precision hygiene knob for bf16 training
    # (``bn_dtype`` config; BASELINE.md r4 sweep).
    bn_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bdt = self.dtype if self.bn_dtype is None else self.bn_dtype
        for i, f in enumerate(self.features):
            x = nn.Dense(f, use_bias=not self.use_bn, dtype=self.dtype,
                         name=f"dense_{i}")(x)
            if self.use_bn:
                # torch BatchNorm2d defaults: momentum 0.1 (=> flax 0.9), eps 1e-5
                x = TorchBatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    axis_name=self.bn_axis_name if train else None,
                    dtype=bdt,
                    name=f"bn_{i}",
                )(x.astype(bdt)).astype(self.dtype)
            x = nn.relu(x)
        return x


def _concat_fan_in_init(total_fan_in: int, slice_fan_in: int):
    """lecun_normal at a forced fan-in: a kernel slice of a conceptual
    concat-Dense must be initialized at the FULL concat fan-in, not its own
    row count, to reproduce the reference ``nn.Linear(1408, .)`` scale."""
    return nn.initializers.variance_scaling(
        scale=slice_fan_in / total_fan_in, mode="fan_in",
        distribution="truncated_normal")


class SplitTail(nn.Module):
    """Fusion tail ``zero_dense(relu(Dense([pts_feat, dyn_feat])))`` with the
    first Dense split into a static (pts_feat) and a dynamic part.

    Mathematically identical to one Dense over the concat (the split just
    partitions the kernel rows; the bias lives in the dynamic half), but it
    lets samplers precompute the pts_feat projection ONCE and re-use it for
    every ODE/SDE step — pts_feat is loop-invariant inside the sampling scan
    and is 1024 of the 1408 input dims, so this removes ~73% of the
    per-step tail FLOPs.  (XLA does not split a dot over a concat operand
    across a scan boundary on its own.)
    """

    hidden: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # init each split slice at the CONCAT fan-in (1024 + dyn) so the
        # initial pre-activation variance matches the single Dense over the
        # concat that this module partitions (lecun on the slice alone would
        # over-scale the narrow dynamic half)
        self.feat_proj = nn.Dense(
            self.hidden, use_bias=False, dtype=self.dtype, name="feat",
            kernel_init=_concat_fan_in_init(1024 + 384, 1024))
        self.dyn_proj = nn.Dense(
            self.hidden, dtype=self.dtype, name="dyn",
            kernel_init=_concat_fan_in_init(1024 + 384, 384))
        self.out = zero_dense(self.out_dim, dtype=self.dtype, name="out")

    def precompute(self, pts_feat):
        return self.feat_proj(pts_feat)

    def from_proj(self, fp, dyn_feat):
        return self.out(nn.relu(fp + self.dyn_proj(dyn_feat)))

    def __call__(self, pts_feat, dyn_feat):
        return self.from_proj(self.precompute(pts_feat), dyn_feat)


class FusedTails(nn.Module):
    """K parallel SplitTail banks fused into single wide matmuls.

    The sampler hot loop evaluates every tail each step; separate 256-wide
    matmuls are latency-bound on the MXU, so the K tails' kernels are stored
    as one [in, K*H] matrix (one matmul) and the K output heads as a banked
    [K, H, O] einsum.  The dynamic input is further split into its t and
    pose parts so a step-constant t row of shape [1, .] broadcasts instead
    of being materialized per sample.  Mathematically identical to K
    independent concat-Dense tails.
    """

    num_tails: int
    hidden: int
    out_dim: int
    t_dim: int = 128
    pose_feat_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        kh = self.num_tails * self.hidden
        # reference scale: one nn.Linear over the concat, fan_in = 1024+t+pose
        total = 1024 + self.t_dim + self.pose_feat_dim
        self.feat_kernel = self.param(
            "feat_kernel", _concat_fan_in_init(total, 1024), (1024, kh))
        self.t_kernel = self.param(
            "t_kernel", _concat_fan_in_init(total, self.t_dim),
            (self.t_dim, kh))
        self.pose_kernel = self.param(
            "pose_kernel", _concat_fan_in_init(total, self.pose_feat_dim),
            (self.pose_feat_dim, kh))
        self.bias = self.param("bias", nn.initializers.zeros, (kh,))
        # zero-init output bank: reference zeroes every tail's last layer
        self.out_kernel = self.param(
            "out_kernel", nn.initializers.zeros,
            (self.num_tails, self.hidden, self.out_dim))
        self.out_bias = self.param(
            "out_bias", nn.initializers.zeros, (self.num_tails, self.out_dim))

    def precompute(self, pts_feat):
        return pts_feat @ self.feat_kernel.astype(self.dtype)

    def from_proj(self, fp, t_feat, pose_feat):
        """fp [N, K*H]; t_feat [1 or N, t_dim]; pose_feat [N, pose_feat_dim]."""
        h = (fp + t_feat @ self.t_kernel.astype(self.dtype)
             + pose_feat @ self.pose_kernel.astype(self.dtype)
             + self.bias.astype(self.dtype))
        h = nn.relu(h)
        h = h.reshape(h.shape[0], self.num_tails, self.hidden)
        out = jnp.einsum("nkh,kho->nko", h, self.out_kernel.astype(self.dtype))
        out = out + self.out_bias.astype(self.dtype)
        return out.reshape(out.shape[0], self.num_tails * self.out_dim)


class PerPointTail(nn.Module):
    """RotHead/TransHead-style decoder tail over PER-POINT features
    (ref ``networks/decoder_head/rot_head.py:8-35``,
    ``trans_head.py:10-41``), channels-last.

    torch pipeline (both heads are the same architecture):
    ``conv1(f->1024)+bn1+relu -> conv2(1024->256)+bn2+relu -> max over
    points -> conv3(256->256)+bn3+relu -> dropout(0.2) -> conv4(256->out)``
    where every convN is a 1x1 Conv1d, i.e. a feature-dim matmul.

    conv1 is linear over the concat ``[pts_feat, t_feat, pose_feat]``
    channel blocks (ref ``scorenet.py:198-204``), so its kernel is stored as
    three row blocks; the pts block is loop-invariant inside a sampler scan
    and exposed via :meth:`precompute`, while the t/pose blocks produce a
    per-sample row that broadcasts over points.
    """

    pts_dim: int = 1280
    t_dim: int = 128
    pose_feat_dim: int = 256
    out_dim: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        total = self.pts_dim + self.t_dim + self.pose_feat_dim
        self.feat_kernel = self.param(
            "feat_kernel", _concat_fan_in_init(total, self.pts_dim),
            (self.pts_dim, 1024))
        self.t_kernel = self.param(
            "t_kernel", _concat_fan_in_init(total, self.t_dim),
            (self.t_dim, 1024))
        self.pose_kernel = self.param(
            "pose_kernel", _concat_fan_in_init(total, self.pose_feat_dim),
            (self.pose_feat_dim, 1024))
        self.bias1 = self.param("bias1", nn.initializers.zeros, (1024,))
        # torch BatchNorm1d defaults: momentum 0.1 (=> flax 0.9), eps 1e-5
        bn = lambda name: TorchBatchNorm(momentum=0.9, epsilon=1e-5,
                                         dtype=self.dtype, name=name)
        self.bn1, self.bn2, self.bn3 = bn("bn1"), bn("bn2"), bn("bn3")
        self.conv2 = nn.Dense(256, dtype=self.dtype, name="conv2")
        self.conv3 = nn.Dense(256, dtype=self.dtype, name="conv3")
        self.conv4 = nn.Dense(self.out_dim, dtype=self.dtype, name="conv4")
        self.drop = nn.Dropout(0.2)

    def precompute(self, pts_feat):
        """pts_feat [bs, N, pts_dim] -> conv1's static part [bs, N, 1024]."""
        return pts_feat @ self.feat_kernel.astype(self.dtype)

    def from_proj(self, fp, t_feat, pose_feat, train: bool = False,
                  use_dropout_rng: bool = False):
        """fp [bs, N, 1024]; t_feat [1 or bs, t_dim]; pose_feat [bs, pose_feat_dim]."""
        dyn = (t_feat @ self.t_kernel.astype(self.dtype)
               + pose_feat @ self.pose_kernel.astype(self.dtype)
               + self.bias1.astype(self.dtype))
        h = fp + dyn[:, None, :]
        h = nn.relu(self.bn1(h, use_running_average=not train))
        h = nn.relu(self.bn2(self.conv2(h), use_running_average=not train))
        h = jnp.max(h, axis=1)  # max-pool over points (rot_head.py:26)
        h = nn.relu(self.bn3(self.conv3(h), use_running_average=not train))
        h = self.drop(h, deterministic=not (train and use_dropout_rng))
        return self.conv4(h)

    def __call__(self, pts_feat, t_feat, pose_feat, train: bool = False,
                 use_dropout_rng: bool = False):
        return self.from_proj(self.precompute(pts_feat), t_feat, pose_feat,
                              train=train, use_dropout_rng=use_dropout_rng)


class MLP(nn.Module):
    """Dense->ReLU stack (no norm) used by the pose / time encoders."""

    features: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype, name=f"dense_{i}")(x)
            x = nn.relu(x)
        return x
