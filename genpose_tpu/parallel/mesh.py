"""Mesh construction and sharding rules.

Design (SURVEY.md section 2.3): the model is small (~10-30M params), so the
only distributed axis that matters is DATA - the (batch x K hypotheses)
axis.  We build a 1-D ``dp`` mesh, shard every batch tensor on axis 0 with
``NamedSharding(mesh, P('dp'))``, replicate params, and let XLA insert the
gradient ``psum`` over ICI.  BatchNorm statistics are computed over the
GLOBAL batch for free because under jit+sharding every reduction is global —
no ``axis_name`` plumbing needed (unlike pmap).

Hypothesis-level parallelism (the reference's bs->bs*K repeat,
``posenet_agent.py:426-438``) works the same way: the flattened (bs*K) axis
is sharded over ``dp``, so K=50 candidate generation rides all chips.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, axis_name: str = "dp") -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices (0 = all)."""
    devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Optional[Mesh], axis_name: str = "dp") -> Optional[NamedSharding]:
    if mesh is None:
        return None
    return NamedSharding(mesh, P(axis_name))


def shard_batch(mesh: Optional[Mesh], tree, axis_name: str = "dp"):
    """Place every array in the tree with axis 0 sharded over the mesh."""
    if mesh is None:
        return tree
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") and x.ndim > 0
        else x,
        tree,
    )


def replicate(mesh: Optional[Mesh], tree):
    """Fully replicate a tree (params / opt state) across the mesh."""
    if mesh is None:
        return tree
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of m >= n (for padding ragged eval batches so the
    sharded axis divides the mesh)."""
    return ((n + m - 1) // m) * m
