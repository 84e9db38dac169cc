"""Shared benchmarking/profiling helpers for ``bench.py`` and ``tools/``.

One copy of the peak-FLOPs table, the head-perturbation helper, and the
chained fori_loop timer (the only timing technique that is stable to ~1%
over the tunneled backend — see BASELINE.md).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

# MXU bf16 peak per chip.  jax reports the v5e's device_kind as
# 'TPU v5 lite' (checked on the real tunnel), not 'v5e'.
PEAK_FLOPS = {"v5 lite": 197e12, "v5e": 197e12, "cpu": 1e11}


def peak_flops() -> float:
    kind = getattr(jax.devices()[0], "device_kind", "cpu").lower()
    for k, v in PEAK_FLOPS.items():
        if k in kind:
            return v
    return 197e12  # assume v5e-class if unrecognized


def derandomize_state(state, scale: float = 0.01, seed: int = 42):
    """Perturb every parameter (and the EMA shadow) so XLA cannot
    constant-fold the zero-initialized heads (the reference zero-inits each
    tail's last layer, ``scorenet.py:120-135`` — a fresh net computes
    score = 0 and the whole ODE scan dead-code-eliminates)."""
    leaves, treedef = jax.tree.flatten(state.params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    leaves = [l + scale * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    params = jax.tree.unflatten(treedef, leaves)
    # the shadow must be a COPY, not an alias: a donating train step
    # (donate_argnums=(0,)) would otherwise donate the same buffer twice
    shadow = jax.tree.map(jnp.copy, params)
    return state.replace(params=params,
                         ema=state.ema.replace(shadow=shadow))


def flops_from_cost(cost) -> float:
    """Unwrap ``compiled.cost_analysis()`` (dict, or list/tuple of dicts
    depending on the jax version) to a flops count."""
    if not cost:
        return 0.0
    c = cost[0] if isinstance(cost, (list, tuple)) else cost
    return float(c.get("flops", 0.0))


def carrier(leaves) -> jnp.ndarray:
    """Reduce an arbitrary pytree of stage outputs to a shape-(1,) f32
    carrier for ``time_chain``'s data-dependence chain (f32 regardless of
    the stage's compute dtype, so bf16 stages chain identically)."""
    return sum(jnp.sum(jnp.asarray(l, jnp.float32))
               for l in jax.tree.leaves(leaves)) * jnp.ones((1,))


def time_chain(fn, pts, key, iters: int, carrier_shape) -> float:
    """Seconds/iteration for ``iters`` copies of ``fn(pts, key_i)`` run
    inside ONE jitted fori_loop, serialized by a data dependence and synced
    by a host copy.  The trip count is a TRACED argument on purpose: XLA's
    loop passes scale compile time with a static bound (measured on the
    tunnel: the same bench program compiles 21-28 min at static n=32 vs
    ~5 min traced, CLAUDE.md) while throughput is identical."""

    @jax.jit
    def chained(pts, key, n):
        def it(i, carry):
            p = pts + 1e-12 * jnp.sum(carry)
            # f32 carry regardless of the stage's compute dtype (bf16 feats)
            return jnp.asarray(fn(p, jax.random.fold_in(key, i)), jnp.float32)
        return jax.lax.fori_loop(0, n, it, jnp.zeros(carrier_shape))

    np.asarray(chained(pts, key, jnp.int32(iters)))  # compile+warm sync
    t0 = time.perf_counter()
    np.asarray(chained(pts, key, jnp.int32(iters)))
    return (time.perf_counter() - t0) / iters


def time_chain_marginal(fn, pts, key, iters: int, carrier_shape):
    """Marginal seconds/iteration: the ``time_chain`` program timed at n and
    2n trips (same executable — the trip count is traced), returning
    ``((t_2n - t_n) / n, envelope_s)`` where the envelope is the fixed
    per-dispatch cost (tunnel RPC + host sync + transfers) that the
    difference cancels.  At large batch the envelope is negligible next to
    compute, but at bs=1 it DOMINATES a plain ``time_chain`` reading
    (measured round 4: ~6 ms/iter of "offset" at 8 iterations = a ~48 ms
    fixed envelope — stage deltas went negative); marginal timing is the
    honest per-iteration device time there."""

    @jax.jit
    def chained(pts, key, n):
        def it(i, carry):
            p = pts + 1e-12 * jnp.sum(carry)
            return jnp.asarray(fn(p, jax.random.fold_in(key, i)), jnp.float32)
        return jax.lax.fori_loop(0, n, it, jnp.zeros(carrier_shape))

    np.asarray(chained(pts, key, jnp.int32(iters)))  # compile+warm sync

    def run(n):
        t0 = time.perf_counter()
        np.asarray(chained(pts, key, jnp.int32(n)))
        return time.perf_counter() - t0

    # interleave and keep the min of each arm: the tunnel's per-dispatch
    # jitter is one-sided (delays), so min-of-3 is the cleanest estimator
    t1 = min(run(iters) for _ in range(3))
    t2 = min(run(2 * iters) for _ in range(3))
    per_iter = (t2 - t1) / iters
    envelope = max(t1 - per_iter * iters, 0.0)
    return per_iter, envelope
