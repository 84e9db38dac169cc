"""Fused FPS + ball-query Pallas kernel (round-5 exploration, VERDICT r4 #7).

Every FPS round already computes the full distance row d^2(center_j, pts)
that the standalone ball query later recomputes for the same center
(``sampling_gpu.cu:118-208`` + ``ball_query_gpu.cu:29-43`` are the two CUDA
loops being fused).  This kernel emits the per-round ball-query
membership/slots for BOTH MSG radii directly from the FPS round's distance
row, removing the standalone kernel's distance work and its centers-gather
input traffic.

Work accounting (why this is NOT the rejected two-radius fusion, which
shared only d^2 between radii): per center-row the mask/rank-scan/slot-count
pipeline is identical to ``ball_query_pallas`` — the fusion saves exactly
(a) one d^2 computation per radius per center and (b) the [B,M,3] gathered
centers round-trip, at the cost of running the BQ rows 64-at-a-time inside
the sequential FPS loop instead of 256-at-a-time in a separate grid.  Total
VPU element-ops are unchanged; the A/B on real hardware decides
(tools/bench_fused_geometry.py; BASELINE.md r5).

MEASURED AND REJECTED (round 5): 16.4% SLOWER on the 3-stage geometry
chain at bs=64 (4.101 vs 3.524 ms; s0 −5.7%, s1 −14.5%, s2 +19.8% —
bench_evidence/onchip_r5/fused_geometry_ab.jsonl).  Running the BQ rows
64-at-a-time inside the sequential FPS loop loses more grid-level
parallelism than the saved per-center d² work buys at the two large
stages.  Kept in-tree (with its bit-exactness test) as a documented dead
end; production ``sa_geometry`` keeps the separate kernels.

Bit-exactness contract: FPS indices match ``fps_pallas`` (same round
arithmetic) and each BQ table matches ``ball_query_pallas(r_i, s_i, xyz,
gather(xyz, fps_idx))`` — the center coordinates used here ARE the selected
points' coordinates, and d^2 uses the same f32 summation order
((dx^2 + dy^2) + dz^2), so the boundary compares agree bit-for-bit
(pinned by tests/test_pointcloud.py::test_fps_bq_fused_matches_components).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUBLANES = 8
_B_TILE = 256


def _bq_row(d2, valid, col_ids, radius2: float, nsample: int):
    """One ball-query row set from a precomputed distance tile.

    d2: (bt, N_pad) squared distances of every point to THIS round's center.
    Returns (bt, nsample) int32 — same semantics as ``ball_query_pallas``:
    first ``nsample`` in-ball indices in index order, first-hit padding,
    zeros when empty."""
    bt, n_pad = d2.shape
    mask = jnp.logical_and(d2 < radius2, valid)
    cnt = jnp.sum(mask.astype(jnp.int32), axis=1, keepdims=True)

    # inclusive cumsum along lanes via log2 doubling of circular rolls
    ranks = mask.astype(jnp.int32)
    shift = 1
    while shift < n_pad:
        rolled = pltpu.roll(ranks, shift=shift, axis=1)
        ranks = ranks + jnp.where(col_ids >= shift, rolled, 0)
        shift *= 2
    ranks = jnp.where(valid, ranks, jnp.int32(2**30))

    cols = [
        jnp.sum((ranks <= s).astype(jnp.int32), axis=1, keepdims=True)
        for s in range(nsample)
    ]
    sel = jnp.concatenate(cols, axis=1)  # (bt, S)
    first_hit = sel[:, 0:1]
    pad = jnp.where(cnt > 0, first_hit, 0)
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (bt, nsample), 1)
    return jnp.where(s_ids < cnt, sel, pad)


def _fused_kernel(x_ref, y_ref, z_ref, fps_ref, *bq_refs, n_valid: int,
                  npoint: int, m_pad: int, radii2: Tuple[float, ...],
                  nsamples: Tuple[int, ...]):
    x = x_ref[...]  # (bt, N_pad)
    y = y_ref[...]
    z = z_ref[...]
    bt, n_pad = x.shape

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (bt, n_pad), 1)
    valid = col_ids < n_valid

    mind0 = jnp.where(valid, jnp.float32(1e10), -jnp.inf)
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (bt, m_pad), 1)
    sel0 = jnp.zeros((bt, m_pad), jnp.int32)  # idxs[:,0]=0 (sampling_gpu.cu:115)

    def center_coords(old):
        onehot = col_ids == old
        xo = jnp.sum(jnp.where(onehot, x, 0.0), axis=1, keepdims=True)
        yo = jnp.sum(jnp.where(onehot, y, 0.0), axis=1, keepdims=True)
        zo = jnp.sum(jnp.where(onehot, z, 0.0), axis=1, keepdims=True)
        return xo, yo, zo

    def emit_bq(j, d2):
        """Write the ball-query rows of center j from its distance row."""
        for i, (r2, s) in enumerate(zip(radii2, nsamples)):
            idx = _bq_row(d2, valid, col_ids, r2, s)
            bq_refs[i][:, pl.ds(j, 1), :] = idx[:, None, :]

    def body(j, carry):
        mind, old, sel = carry  # old: (bt, 1) = center j-1
        xo, yo, zo = center_coords(old)
        # same f32 order as ball_query_pallas/fps_pallas -> bit-equal compares
        d2 = ((x - xo) ** 2 + (y - yo) ** 2) + (z - zo) ** 2
        emit_bq(j - 1, d2)
        mind = jnp.minimum(mind, d2)
        best = jnp.max(mind, axis=1, keepdims=True)
        is_best = jnp.logical_and(mind == best, valid)
        new_old = jnp.min(jnp.where(is_best, col_ids, jnp.int32(2**30)),
                          axis=1, keepdims=True)
        sel = jnp.where(slot_ids == j, new_old, sel)
        return mind, new_old, sel

    _, last, sel = jax.lax.fori_loop(
        1, npoint, body, (mind0, jnp.zeros((bt, 1), jnp.int32), sel0)
    )
    # epilogue: the final center's distance row was never computed
    xo, yo, zo = center_coords(last)
    d2 = ((x - xo) ** 2 + (y - yo) ** 2) + (z - zo) ** 2
    emit_bq(npoint - 1, d2)
    fps_ref[...] = sel


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def fps_bq_fused(
    xyz: jnp.ndarray,
    npoint: int,
    radii: Tuple[float, ...],
    nsamples: Tuple[int, ...],
):
    """xyz [B, N, 3] f32 -> (fps_idx [B, npoint] i32,
    (bq_idx_i [B, npoint, nsamples[i]] i32 per radius)).

    Semantically identical to ``fps_pallas(xyz, npoint)`` followed by
    ``ball_query_pallas(r_i, s_i, xyz, one_hot_gather(xyz, fps_idx))`` for
    each (r_i, s_i)."""
    assert len(radii) == len(nsamples) and radii
    B, N, _ = xyz.shape
    n_pad = ((N + _LANES - 1) // _LANES) * _LANES
    m_pad = ((npoint + _LANES - 1) // _LANES) * _LANES

    # VMEM: 6 (bt, n_pad) f32 working tiles + the BQ output blocks
    # (bt, m_pad, S_i) i32 must fit together
    out_bytes_per_row = 4 * m_pad * (1 + sum(nsamples))
    b_round = ((B + _SUBLANES - 1) // _SUBLANES) * _SUBLANES
    b_tile = max(_SUBLANES,
                 min(_B_TILE, b_round,
                     (10 << 20) // (6 * 4 * n_pad + out_bytes_per_row)
                     // _SUBLANES * _SUBLANES))
    b_pad = ((B + b_tile - 1) // b_tile) * b_tile

    xyz = xyz.astype(jnp.float32)
    xyz_p = jnp.pad(xyz, ((0, b_pad - B), (0, n_pad - N), (0, 0)))
    planes = jnp.moveaxis(xyz_p, -1, 0)

    kernel = functools.partial(
        _fused_kernel, n_valid=N, npoint=npoint, m_pad=m_pad,
        radii2=tuple(float(r) * float(r) for r in radii),
        nsamples=tuple(nsamples))
    plane_spec = pl.BlockSpec((b_tile, n_pad), lambda b: (b, 0),
                              memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(b_pad // b_tile,),
        in_specs=[plane_spec, plane_spec, plane_spec],
        out_specs=[
            pl.BlockSpec((b_tile, m_pad), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((b_tile, m_pad, s), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
            for s in nsamples
        ],
        out_shape=[jax.ShapeDtypeStruct((b_pad, m_pad), jnp.int32)] + [
            jax.ShapeDtypeStruct((b_pad, m_pad, s), jnp.int32)
            for s in nsamples
        ],
        interpret=jax.default_backend() != "tpu",
    )(planes[0], planes[1], planes[2])
    fps_idx = outs[0][:B, :npoint]
    bq = tuple(o[:B, :npoint, :] for o in outs[1:])
    return fps_idx, bq
