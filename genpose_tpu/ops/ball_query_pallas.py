"""Pallas TPU kernel for exact CUDA-semantics ball query.

Reference semantics (``src/ball_query_gpu.cu:9-45``): for each center, the
first ``nsample`` point indices (in index order) with d^2 < r^2, padded with
the *first* hit; an all-zero row when the ball is empty.

The pure-XLA formulation (``ops/pointcloud.py::ball_query_ref``) is
HBM-bound: it materializes the [B, M, N] squared-distance / cumulative-rank
tensors and re-reads the ranks once per output slot (S reads of ~134MB at
the stage-0 shape).  This kernel keeps one (TM, N) tile of distances/ranks
resident in VMEM and does the whole mask -> cumsum -> rank-count pipeline
on the VPU, so HBM traffic collapses to the xyz planes in and the [B, M, S]
indices out.

Layout: batch and center tiles on the grid; centers on sublanes, points on
lanes (same planes convention as ``fps_pallas``).  The cumulative rank along
the lane axis is a log2(N) doubling scan built from ``pltpu.roll``.

Bit-exactness: d^2 is computed with the same f32 operation order as the XLA
oracle ((dx^2 + dy^2) + dz^2), so the boundary compare d^2 < r^2 agrees
exactly; everything downstream is integer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUBLANES = 8
_M_TILE = 256


def _bq_kernel(x_ref, y_ref, z_ref, cx_ref, cy_ref, cz_ref, out_ref, *,
               n_valid: int, radius2: float, nsample: int):
    x = x_ref[0]  # (1, N_pad)
    y = y_ref[0]
    z = z_ref[0]
    tm = cx_ref.shape[-1]
    n_pad = x.shape[-1]

    cx = cx_ref[...].reshape(tm, 1)
    cy = cy_ref[...].reshape(tm, 1)
    cz = cz_ref[...].reshape(tm, 1)

    # same f32 summation order as the XLA oracle -> bit-identical compares
    d2 = ((cx - x) ** 2 + (cy - y) ** 2) + (cz - z) ** 2  # (TM, N_pad)

    col = jax.lax.broadcasted_iota(jnp.int32, (tm, n_pad), 1)
    valid = col < n_valid
    mask = jnp.logical_and(d2 < radius2, valid)
    cnt = jnp.sum(mask.astype(jnp.int32), axis=1, keepdims=True)  # (TM, 1)

    # inclusive cumsum along lanes via log2 doubling of circular rolls
    ranks = mask.astype(jnp.int32)
    shift = 1
    while shift < n_pad:
        rolled = pltpu.roll(ranks, shift=shift, axis=1)
        ranks = ranks + jnp.where(col >= shift, rolled, 0)
        shift *= 2

    # padded-tail columns must never be counted as "rank <= s"
    ranks = jnp.where(valid, ranks, jnp.int32(2**30))

    # sel[s] = #{n: ranks[n] <= s} = index of the (s+1)-th in-ball point
    cols = [
        jnp.sum((ranks <= s).astype(jnp.int32), axis=1, keepdims=True)
        for s in range(nsample)
    ]
    sel = jnp.concatenate(cols, axis=1)  # (TM, S)

    first_hit = sel[:, 0:1]
    pad = jnp.where(cnt > 0, first_hit, 0)
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (tm, nsample), 1)
    idx = jnp.where(s_ids < cnt, sel, pad)
    out_ref[...] = idx.reshape(1, 1, tm, nsample)


@functools.partial(jax.jit, static_argnums=(0, 1))
def ball_query_pallas(radius: float, nsample: int, xyz: jnp.ndarray,
                      new_xyz: jnp.ndarray) -> jnp.ndarray:
    """xyz [B, N, 3], new_xyz [B, M, 3] -> idx [B, M, nsample] int32."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    n_pad = ((N + _LANES - 1) // _LANES) * _LANES
    # keep ~4 (m_tile, n_pad) i32/f32 tiles well under VMEM; clamp to the
    # (sublane-rounded) center count so small-M stages don't pad dead rows
    m_round = ((M + _SUBLANES - 1) // _SUBLANES) * _SUBLANES
    m_tile = max(_SUBLANES, min(_M_TILE, m_round,
                                (4 << 20) // (4 * n_pad)
                                // _SUBLANES * _SUBLANES))
    m_pad = ((M + m_tile - 1) // m_tile) * m_tile

    n_mtiles = m_pad // m_tile
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)
    # planes shaped so every size-1 block dim is FULL on its array axis
    # (Mosaic requires the last two block dims 8/128-aligned or full)
    planes = jnp.moveaxis(jnp.pad(xyz, ((0, 0), (0, n_pad - N), (0, 0))),
                          -1, 0).reshape(3, B, 1, n_pad)
    # pad centers with a far-away sentinel so padded rows are harmless
    cplanes = jnp.moveaxis(
        jnp.pad(new_xyz, ((0, 0), (0, m_pad - M), (0, 0)),
                constant_values=1e9), -1, 0
    ).reshape(3, B, n_mtiles, 1, m_tile)

    kernel = functools.partial(_bq_kernel, n_valid=N,
                               radius2=float(radius) * float(radius),
                               nsample=nsample)
    pts_spec = pl.BlockSpec((1, 1, n_pad), lambda b, m: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    ctr_spec = pl.BlockSpec((1, 1, 1, m_tile), lambda b, m: (b, m, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_mtiles),
        in_specs=[pts_spec, pts_spec, pts_spec, ctr_spec, ctr_spec, ctr_spec],
        out_specs=pl.BlockSpec((1, 1, m_tile, nsample),
                               lambda b, m: (b, m, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_mtiles, m_tile, nsample),
                                       jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(planes[0], planes[1], planes[2], cplanes[0], cplanes[1], cplanes[2])
    return out.reshape(B, m_pad, nsample)[:, :M, :]
