"""Vanilla PointNet encoder with spatial transformer (alternative encoder).

Re-design of ``networks/pts_encoder/pointnets.py:14-123`` in channels-last
flax.  Per-point 1x1 convs become feature-dim Dense layers (MXU matmuls).
The reference removed BN ("NOTE: removed BN", ``pointnets.py:82``); we match.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class STNkd(nn.Module):
    """Spatial transformer predicting a k x k alignment matrix
    (ref ``pointnets.py:45-79``)."""

    k: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, N, k]
        h = nn.relu(nn.Dense(64, dtype=self.dtype)(x))
        h = nn.relu(nn.Dense(128, dtype=self.dtype)(h))
        h = nn.relu(nn.Dense(1024, dtype=self.dtype)(h))
        h = jnp.max(h, axis=1)  # [B, 1024]
        h = nn.relu(nn.Dense(512, dtype=self.dtype)(h))
        h = nn.relu(nn.Dense(256, dtype=self.dtype)(h))
        # DELIBERATE deviation: the reference's fc3 is a randomly
        # initialized Linear plus the identity (``pointnets.py:45-79``), so
        # its T-net starts at identity-plus-noise; zero-initializing the
        # last layer starts at the EXACT identity — the standard stable
        # T-net init.  Ported reference weights overwrite this either way.
        h = nn.Dense(
            self.k * self.k,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(h)
        iden = jnp.eye(self.k, dtype=h.dtype).reshape(-1)
        return (h + iden).reshape(-1, self.k, self.k)


class PointNetfeat(nn.Module):
    """Global PointNet feature (ref ``pointnets.py:83-123``).

    Input [B, N, in_dim] (channels-last) -> [B, out_dim].
    """

    in_dim: int = 3
    out_dim: int = 1024
    feature_transform: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        trans = STNkd(k=self.in_dim, dtype=self.dtype, name="stn")(x)
        x = jnp.einsum("bnk,bkj->bnj", x, trans)
        x = nn.relu(nn.Dense(64, dtype=self.dtype)(x))
        if self.feature_transform:
            trans_feat = STNkd(k=64, dtype=self.dtype, name="fstn")(x)
            x = jnp.einsum("bnk,bkj->bnj", x, trans_feat)
        x = nn.relu(nn.Dense(128, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(512, dtype=self.dtype)(x))
        x = nn.Dense(self.out_dim, dtype=self.dtype)(x)
        return jnp.max(x, axis=1)  # [B, out_dim]
