"""Pallas TPU kernel for iterative furthest point sampling.

FPS is the one genuinely sequential op in the encoder (reference CUDA:
``src/sampling_gpu.cu:93-208``): seed index 0, then ``m-1`` rounds of
(update running min-distance to the selected set, full-N argmax).

TPU design:
- the sequential axis is the m rounds ONLY.  The whole batch advances
  together each round: coordinates and the running min-distance live as
  ``(B_tile, N)`` VMEM tiles (batch on sublanes, points on lanes), so one
  round is a handful of full-width VPU ops + per-row (lane-axis) reductions
  for every cloud at once.  A per-cloud grid would serialize B*m rounds on
  the single TensorCore (~64x slower at B=64, measured).
- grid tiles the batch only when it exceeds ``_B_TILE`` rows of VMEM budget.
- selected indices accumulate in a carried ``(B_tile, m)`` register block and
  are written once at the end — no per-round dynamic stores.

Padded tail points (N < lane multiple) get -inf min-distance so the argmax
never selects them; padded batch rows compute garbage that is sliced away.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUBLANES = 8
# 6 (B,N) f32 tiles live at once (xyz, mind, scratch); 256 rows x 4096 pts
# x 4B x 6 = 25MB > VMEM, so the tile also shrinks with N at call time.
_B_TILE = 256


def _fps_kernel(x_ref, y_ref, z_ref, out_ref, *, n_valid: int, npoint: int,
                m_pad: int):
    x = x_ref[...]  # (B_tile, N_pad)
    y = y_ref[...]
    z = z_ref[...]
    bt, n_pad = x.shape

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (bt, n_pad), 1)
    valid = col_ids < n_valid

    mind0 = jnp.where(valid, jnp.float32(1e10), -jnp.inf)
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (bt, m_pad), 1)
    sel0 = jnp.zeros((bt, m_pad), jnp.int32)  # idxs[:,0]=0 (sampling_gpu.cu:115)

    def body(j, carry):
        mind, old, sel = carry  # old: (bt, 1) current point per row
        onehot = col_ids == old
        xo = jnp.sum(jnp.where(onehot, x, 0.0), axis=1, keepdims=True)
        yo = jnp.sum(jnp.where(onehot, y, 0.0), axis=1, keepdims=True)
        zo = jnp.sum(jnp.where(onehot, z, 0.0), axis=1, keepdims=True)
        d = (x - xo) ** 2 + (y - yo) ** 2 + (z - zo) ** 2
        mind = jnp.minimum(mind, d)
        best = jnp.max(mind, axis=1, keepdims=True)
        is_best = jnp.logical_and(mind == best, valid)
        # first column attaining the max (matches jnp.argmax tie rule)
        new_old = jnp.min(jnp.where(is_best, col_ids, jnp.int32(2**30)),
                          axis=1, keepdims=True)
        sel = jnp.where(slot_ids == j, new_old, sel)
        return mind, new_old, sel

    _, _, sel = jax.lax.fori_loop(
        1, npoint, body, (mind0, jnp.zeros((bt, 1), jnp.int32), sel0)
    )
    out_ref[...] = sel


@functools.partial(jax.jit, static_argnums=(1,))
def fps_pallas(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Furthest point sampling.  xyz: [B, N, 3] float32 -> idx [B, npoint] int32."""
    B, N, _ = xyz.shape
    n_pad = ((N + _LANES - 1) // _LANES) * _LANES
    m_pad = ((npoint + _LANES - 1) // _LANES) * _LANES

    # keep ~6 (b_tile, n_pad) f32 tiles under a ~8MB VMEM budget; never let
    # the tile exceed the (sublane-rounded) batch — a 256-row floor at B=64
    # would pad 4x dead rows into every VPU op of every sequential round
    b_round = ((B + _SUBLANES - 1) // _SUBLANES) * _SUBLANES
    b_tile = max(_SUBLANES, min(_B_TILE, b_round,
                                (8 << 20) // (6 * 4 * n_pad)
                                // _SUBLANES * _SUBLANES))
    b_pad = ((B + b_tile - 1) // b_tile) * b_tile

    xyz = xyz.astype(jnp.float32)
    xyz_p = jnp.pad(xyz, ((0, b_pad - B), (0, n_pad - N), (0, 0)))
    planes = jnp.moveaxis(xyz_p, -1, 0)  # (3, b_pad, n_pad)
    x, y, z = planes[0], planes[1], planes[2]

    kernel = functools.partial(_fps_kernel, n_valid=N, npoint=npoint,
                               m_pad=m_pad)
    plane_spec = pl.BlockSpec((b_tile, n_pad), lambda b: (b, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // b_tile,),
        in_specs=[plane_spec, plane_spec, plane_spec],
        out_specs=pl.BlockSpec((b_tile, m_pad), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, m_pad), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(x, y, z)
    return out[:B, :npoint]
