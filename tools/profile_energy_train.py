"""Energy/ranking TRAIN-step profiler (ref ``trainer.py:325-388``).

Times the full energy-with-ranking training iteration — the pinned score
teacher generates K candidates (adaptive RK45 or fixed-step ODE), then the
energy agent runs DSM + O(K^2) ranking + update — as ONE jitted program
with the state carried through a fori_loop chain (same ~1%-stable
technique as the other profilers; per-iteration dispatch over the tunnel
would cost ~20-35 ms of RPC each).

Env knobs: TRAIN_BATCH (192), TRAIN_K (5), SAMPLER (ode_adaptive | ode),
FREEZE (0 = teacher weights passed as jit arguments — the train_energy
production mode, compile-cache-eligible; 1 = baked as XLA constants; the
on-chip A/B showed the difference is within noise, BASELINE.md r3),
GEOM_SHARED (1 = one weight-independent geometry pass shared
between teacher sampling and the energy step, 0 = each encodes from
scratch), DISPATCH (fused = one fori_loop program, the ~1%-stable default;
two = the production trainer's ACTUAL dispatch structure — agent.sample()
then agent.train_step_energy() as separate jit calls per iteration, chained
through a data dependence.  GEOM_SHARED only matters here: inside one fused
program XLA CSEs the duplicate geometry either way, so the fused A/B is a
no-op by construction), BENCH_ITERS (8).  Prints one JSON line per
measurement.
"""

import json
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("BENCH_CACHE", "/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from genpose_tpu.utils.benchmarking import derandomize_state


def main():
    from genpose_tpu.config import Config
    from genpose_tpu.training.agent import PoseAgent

    bs = int(os.environ.get("TRAIN_BATCH", "192"))
    K = int(os.environ.get("TRAIN_K", "5"))
    npts = int(os.environ.get("TRAIN_POINTS", "1024"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    sampler = os.environ.get("SAMPLER", "ode_adaptive")
    freeze = os.environ.get("FREEZE", "0") == "1"
    geom_shared = os.environ.get("GEOM_SHARED", "0") == "1"
    dispatch = os.environ.get("DISPATCH", "fused")
    assert dispatch in ("fused", "two"), dispatch

    cfg = Config(num_points=npts, batch_size=bs,
                 sampler_mode=(sampler,), sampling_steps=500)
    agent_s = PoseAgent(cfg, "score")
    agent_e = PoseAgent(cfg, "energy")
    agent_s.state = derandomize_state(agent_s.state)
    agent_e.state = derandomize_state(agent_e.state, seed=43)
    s_state = agent_s.state

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(bs, npts, 3)).astype(np.float32) * 0.1)
    center = jnp.asarray(rng.normal(size=(bs, 3)).astype(np.float32) * 0.01)
    gt = jnp.asarray(rng.normal(size=(bs, agent_s.pose_dim)).astype(np.float32))
    base = {
        "zero_mean_pts": pts,
        "zero_mean_gt_pose": gt,
        "gt_pose": gt.at[:, -3:].add(center),
        "pts_center": center,
        "id": jnp.asarray(rng.integers(1, 7, size=(bs, 1)), jnp.int32),
        "handle_visibility": jnp.ones((bs, 1), jnp.int32),
    }

    if dispatch == "two":
        # The production train_energy loop verbatim: two jit dispatches per
        # iteration (teacher sample, then energy step), serialized by feeding
        # the previous iteration's loss into the next batch.  Both arms pay
        # the same 2 RPCs/iter over the tunnel, so the shared-vs-unshared
        # delta isolates the energy step's duplicated geometry pass.
        if freeze:
            agent_s.freeze()  # routes sample() through the frozen program

        def one_iter(i, carry):
            batch = dict(base)
            batch["zero_mean_pts"] = base["zero_mean_pts"] + 1e-12 * carry
            k1 = jax.random.fold_in(jax.random.PRNGKey(7), 2 * i)
            k2 = jax.random.fold_in(jax.random.PRNGKey(7), 2 * i + 1)
            if geom_shared:
                pred, geom = agent_s.sample(
                    batch, k1, repeat_num=K, sampler=sampler,
                    num_steps=cfg.sampling_steps, return_geometry=True)
            else:
                pred = agent_s.sample(batch, k1, repeat_num=K, sampler=sampler,
                                      num_steps=cfg.sampling_steps)
                geom = None
            losses = agent_e.train_step_energy(batch, pred, k2, geometry=geom)
            return jnp.asarray(losses["gf"], jnp.float32)

        carry = one_iter(0, jnp.float32(0.0))
        np.asarray(carry)  # compile + warm sync
        t0 = time.perf_counter()
        for i in range(1, iters + 1):
            carry = one_iter(i, carry)
        np.asarray(carry)
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "metric": "energy_train_full_iter_ms",
            "value": round(1e3 * dt, 3),
            "config": {"bs": bs, "K": K, "sampler": sampler,
                       "dispatch": "two", "teacher_frozen": freeze,
                       "geom_shared": geom_shared},
        }), flush=True)
        print(json.dumps({
            "metric": "energy_train_samples_per_sec",
            "value": round(bs / dt, 1),
            "config": {"bs": bs, "K": K, "sampler": sampler,
                       "dispatch": "two", "teacher_frozen": freeze,
                       "geom_shared": geom_shared},
        }), flush=True)
        return

    def sample_fn(sst, batch, k):
        return agent_s._sample_impl(
            sst, batch, k, repeat_num=K, sampler=sampler,
            num_steps=cfg.sampling_steps, return_geometry=geom_shared)

    # One program: `n` chained (sample -> energy train step) iterations.
    # The state carry serializes the train steps; the 1e-12 loss bump on the
    # input points serializes the sampling too.  With FREEZE=0 (default,
    # the train_energy production mode) the teacher state is a jit
    # argument; FREEZE=1 closes over it (XLA constants) for the A/B.
    def chained_impl(e_state, sst, key, n):
        def it(i, carry):
            e_st, c = carry
            batch = dict(base)
            batch["zero_mean_pts"] = base["zero_mean_pts"] + 1e-12 * c
            if geom_shared:
                pred, geom = sample_fn(sst, batch, jax.random.fold_in(key, 2 * i))
            else:
                pred, geom = sample_fn(sst, batch, jax.random.fold_in(key, 2 * i)), None
            new_st, losses = agent_e._train_step_energy_impl(
                e_st, batch, pred, jax.random.fold_in(key, 2 * i + 1),
                geometry=geom)
            return (new_st, jnp.asarray(losses["gf"], jnp.float32))
        return jax.lax.fori_loop(0, n, it, (e_state, jnp.float32(0.0)))

    def sample_only_impl(e_state, sst, key, n):
        def it(i, carry):
            e_st, c = carry
            batch = dict(base)
            batch["zero_mean_pts"] = base["zero_mean_pts"] + 1e-12 * c
            pred = sample_fn(sst, batch, jax.random.fold_in(key, 2 * i))
            if geom_shared:
                pred = pred[0]
            return (e_st, jnp.asarray(jnp.sum(pred), jnp.float32))
        return jax.lax.fori_loop(0, n, it, (e_state, jnp.float32(0.0)))

    import functools as _ft
    if freeze:
        chained = jax.jit(_ft.partial(chained_impl, sst=s_state))
        sample_only = jax.jit(_ft.partial(sample_only_impl, sst=s_state))
        args = lambda key: (agent_e.state,)
        kw = lambda key, n: {"key": key, "n": n}
    else:
        chained = jax.jit(chained_impl)
        sample_only = jax.jit(sample_only_impl)
        args = lambda key: (agent_e.state, s_state)
        kw = lambda key, n: {"key": key, "n": n}

    key = jax.random.PRNGKey(7)
    results = {}
    for name, fn in (("sample_only", sample_only), ("full_iter", chained)):
        _, loss = fn(*args(key), **kw(key, jnp.int32(iters)))
        np.asarray(loss)  # compile + warm sync
        t0 = time.perf_counter()
        _, loss = fn(*args(key), **kw(key, jnp.int32(iters)))
        np.asarray(loss)
        dt = (time.perf_counter() - t0) / iters
        results[name] = dt
        print(json.dumps({
            "metric": f"energy_train_{name}_ms",
            "value": round(1e3 * dt, 3),
            "config": {"bs": bs, "K": K, "sampler": sampler,
                       "teacher_frozen": freeze, "geom_shared": geom_shared},
        }), flush=True)

    print(json.dumps({
        "metric": "energy_train_samples_per_sec",
        "value": round(bs / results["full_iter"], 1),
        "config": {"bs": bs, "K": K, "sampler": sampler,
                   "teacher_frozen": freeze, "geom_shared": geom_shared},
    }), flush=True)


if __name__ == "__main__":
    main()
