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

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, use_bias=not self.use_bn, dtype=self.dtype,
                         name=f"dense_{i}")(x)
            if self.use_bn:
                # torch BatchNorm2d defaults: momentum 0.1 (=> flax 0.9), eps 1e-5
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    axis_name=self.bn_axis_name if train else None,
                    dtype=self.dtype,
                    name=f"bn_{i}",
                )(x)
            x = nn.relu(x)
        return x


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
