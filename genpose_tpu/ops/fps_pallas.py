"""Pallas TPU kernel for iterative furthest point sampling.

FPS is the one genuinely sequential op in the encoder (reference CUDA:
``src/sampling_gpu.cu:93-208``): seed index 0, then ``m-1`` rounds of
(update running min-distance to the selected set, full-N argmax).

TPU design:
- grid over the batch; each program owns one cloud.
- coordinates live in VMEM as three ``(8, N/8)`` planes so each distance
  update is a handful of full-width VPU ops (8x128 lanes).
- the running min-distance vector stays in VMEM registers across all rounds
  (carried through ``lax.fori_loop``), so the only HBM traffic is the initial
  coordinate load and the final index store.
- selected indices are accumulated in a carried vector register and written
  once at the end — no per-round dynamic stores.

Padded tail points (N not a multiple of 8*128) are initialized to -inf
min-distance so the argmax never selects them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUBLANES = 8


def _fps_kernel(x_ref, y_ref, z_ref, out_ref, *, n_valid: int, npoint: int,
                m_pad: int):
    x = x_ref[0]  # (8, C)
    y = y_ref[0]
    z = z_ref[0]
    rows, cols = x.shape

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    # Linear point index: planes are row-major reshapes of the N axis.
    lin = row_ids * cols + col_ids
    valid = lin < n_valid

    mind0 = jnp.where(valid, jnp.float32(1e10), -jnp.inf)

    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (1, m_pad), 1)
    sel0 = jnp.zeros((1, m_pad), jnp.int32)  # idxs[0] = 0 (sampling_gpu.cu:115)

    def body(j, carry):
        mind, old, sel = carry
        onehot = lin == old
        xo = jnp.sum(jnp.where(onehot, x, 0.0))
        yo = jnp.sum(jnp.where(onehot, y, 0.0))
        zo = jnp.sum(jnp.where(onehot, z, 0.0))
        d = (x - xo) ** 2 + (y - yo) ** 2 + (z - zo) ** 2
        mind = jnp.minimum(mind, d)
        # argmax over the (8, C) plane -> linear point index
        best = jnp.max(mind)
        is_best = jnp.logical_and(mind == best, valid)
        # first linear index attaining the max (matches jnp.argmax tie rule)
        new_old = jnp.min(jnp.where(is_best, lin, jnp.int32(2**30)))
        sel = jnp.where(slot_ids == j, new_old, sel)
        return mind, new_old, sel

    _, _, sel = jax.lax.fori_loop(
        1, npoint, body, (mind0, jnp.int32(0), sel0)
    )
    out_ref[0, 0] = sel[0]


@functools.partial(jax.jit, static_argnums=(1,))
def fps_pallas(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Furthest point sampling.  xyz: [B, N, 3] float32 -> idx [B, npoint] int32."""
    B, N, _ = xyz.shape
    chunk = _SUBLANES * _LANES
    n_pad = ((N + chunk - 1) // chunk) * chunk
    cols = n_pad // _SUBLANES

    m_pad = ((npoint + _LANES - 1) // _LANES) * _LANES

    xyz = xyz.astype(jnp.float32)
    pad = ((0, 0), (0, n_pad - N), (0, 0))
    xyz_p = jnp.pad(xyz, pad)
    planes = jnp.moveaxis(xyz_p, -1, 1).reshape(B, 3, _SUBLANES, cols)
    x, y, z = planes[:, 0], planes[:, 1], planes[:, 2]

    kernel = functools.partial(_fps_kernel, n_valid=N, npoint=npoint, m_pad=m_pad)
    plane_spec = pl.BlockSpec((1, _SUBLANES, cols), lambda b: (b, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[plane_spec, plane_spec, plane_spec],
        out_specs=pl.BlockSpec((1, 1, m_pad), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, m_pad), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(x, y, z)
    return out[:, 0, :npoint]
