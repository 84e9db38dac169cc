"""bs=1 serving-latency attribution with marginal chain timing (VERDICT r3 #6).

A plain ``time_chain`` cannot resolve bs=1: the fixed per-dispatch envelope
(tunnel RPC + sync + transfers, ~48 ms) divided by the iteration count
swamps the ~1 ms of device compute — the round-4 first attempt read a 6 ms
"offset" at 8 iterations and NEGATIVE stage deltas.  This tool times every
cumulative prefix of the serving pipeline at n and 2n fori_loop trips (same
executable; the trip count is traced) and reports the marginal time, which
cancels the envelope exactly.  It also reports the measured envelope itself
— the dispatch-side cost a single-request (non-pipelined) client would pay
on top of device latency.

Run on the real TPU: ``python tools/profile_bs1.py`` (env BENCH_BATCH=1
default / BENCH_K / BENCH_ITERS).  Prints one JSON line per measurement.
"""

import json
import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("BENCH_CACHE", "/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from genpose_tpu.utils.benchmarking import (
    carrier, derandomize_state, time_chain_marginal)


def main():
    from genpose_tpu.config import Config
    from genpose_tpu.runners.serving import InferencePipeline

    bs = int(os.environ.get("BENCH_BATCH", "1"))
    K = int(os.environ.get("BENCH_K", "50"))
    iters = int(os.environ.get("BENCH_ITERS", "32"))
    sampler = os.environ.get("BENCH_SAMPLER", "ode_adaptive")

    cfg = Config(num_points=1024, eval_repeat_num=K, sampling_steps=500,
                 batch_size=bs, compute_dtype="bfloat16", T0=0.55,
                 sampler_mode=(sampler,))
    pipe = InferencePipeline(cfg, batch_size=bs)
    sa, ea = pipe.score_agent, pipe.energy_agent
    sa.state = derandomize_state(sa.state)
    ea.state = derandomize_state(ea.state, seed=43)  # distinct: CSE canary
    s_state, e_state = sa.state, ea.state

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(bs, 1024, 3)).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(7)

    def _center(p):
        c = jnp.mean(p[:, :, :3], axis=1)
        return {"zero_mean_pts": p.at[:, :, :3].add(-c[:, None, :]),
                "pts_center": c}

    def f_geom(p, k):
        return carrier(sa.pts_geometry(_center(p)["zero_mean_pts"]))

    def f_encode(p, k):
        b = _center(p)
        geom = sa.pts_geometry(b["zero_mean_pts"])
        feat, _ = sa._encode_and_score_fn(
            s_state.ema.shadow, s_state.batch_stats, b["zero_mean_pts"],
            train=False, geometry=geom)
        return jnp.sum(feat, axis=1)

    def f_sample(p, k):
        b = _center(p)
        geom = sa.pts_geometry(b["zero_mean_pts"])
        pred = sa._sample_impl(s_state, b, k, repeat_num=K, sampler=sampler,
                               num_steps=cfg.sampling_steps, T0=cfg.T0,
                               geometry=geom)
        return pred[:, 0]

    def f_energy(p, k):
        b = _center(p)
        geom = sa.pts_geometry(b["zero_mean_pts"])
        pred = sa._sample_impl(s_state, b, k, repeat_num=K, sampler=sampler,
                               num_steps=cfg.sampling_steps, T0=cfg.T0,
                               geometry=geom)
        t_in = jnp.full((p.shape[0], K), 1e-5)
        energy = ea._get_energy_impl(e_state, b, pred, t_in, geometry=geom)
        return jnp.sum(energy, axis=(1, 2))

    def f_full(p, k):
        return pipe._run(s_state, e_state, p, k)["pred_pose"]

    prefixes = [
        ("geometry", f_geom, (1,)),
        ("score_encode", f_encode, (bs,)),
        ("sampler", f_sample, (bs, 9)),
        ("energy", f_energy, (bs,)),
        ("full_pipeline", f_full, (bs, 7)),
    ]

    times = {}
    for name, fn, shape in prefixes:
        t, env = time_chain_marginal(fn, pts, key, iters, shape)
        times[name] = t
        print(json.dumps({"metric": f"prefix_{name}_ms",
                          "value": round(1e3 * t, 3),
                          "envelope_ms": round(1e3 * env, 1)}), flush=True)

    order = [n for n, _, _ in prefixes]
    stage_name = {"full_pipeline": "rank_pool", "geometry": "geometry"}
    prev_t = 0.0
    for i, cur in enumerate(order):
        delta = times[cur] - prev_t
        prev_t = times[cur]
        name = stage_name.get(cur, cur) if i else "geometry"
        print(json.dumps({"metric": f"stage_{name}_ms",
                          "value": round(1e3 * delta, 3)}), flush=True)

    print(json.dumps({
        "metric": "bs_latency_ms",
        "value": round(1e3 * times["full_pipeline"], 3),
        "batch": bs,
        "per_object_ms": round(1e3 * times["full_pipeline"] / bs, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
