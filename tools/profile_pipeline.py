"""Stage-level pipeline profiler + whole-pipeline MFU (VERDICT r2 #7/#8).

Times cumulative PREFIXES of the serving pipeline (geometry -> score encode
-> K-hypothesis sampling -> energy -> rank/pool) with the round-2 technique
that is stable to ~1% over the tunnel: all iterations run inside ONE jitted
``fori_loop`` chained through a data dependence, synced by a host copy.
Successive differences attribute time per stage; the empty-chain offset is
subtracted.  Whole-pipeline FLOPs come from XLA's own cost analysis of the
compiled program, giving an MFU against the chip's bf16 peak.

Also A/B-measures the stacked two-trunk encoder idea (#8): the score and
energy encoders run identical SharedMLP stacks with different weights on
the same shared geometry — a [2, ...]-stacked vmap turns the two matmul
chains into one batched chain.

Run on the real TPU: ``python tools/profile_pipeline.py`` (env BENCH_BATCH /
BENCH_K / BENCH_ITERS).  Prints one JSON line per measurement.
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
    carrier, derandomize_state, flops_from_cost, peak_flops as _peak,
    time_chain as _time_chain)


def main():
    from genpose_tpu.config import Config
    from genpose_tpu.models.posenet import GFObjectPose
    from genpose_tpu.runners.serving import InferencePipeline

    bs = int(os.environ.get("BENCH_BATCH", "64"))
    K = int(os.environ.get("BENCH_K", "50"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    sampler = os.environ.get("BENCH_SAMPLER", "ode_adaptive")

    cfg = Config(num_points=1024, eval_repeat_num=K, sampling_steps=500,
                 batch_size=bs, compute_dtype="bfloat16", T0=0.55,
                 sampler_mode=(sampler,))
    pipe = InferencePipeline(cfg, batch_size=bs)
    sa, ea = pipe.score_agent, pipe.energy_agent

    sa.state = derandomize_state(sa.state)
    # distinct seed: same-seed perturbation would leave the energy encoder
    # bit-equal to the score encoder, and the closed-over (constant-baked)
    # states then let XLA CSE the second trunk encode away — corrupting the
    # energy-stage delta, the full-pipeline time, the MFU denominator, and
    # the stacked-encoder A/B (its two_encodes arm would run ONE trunk)
    ea.state = derandomize_state(ea.state, seed=43)
    s_state, e_state = sa.state, ea.state

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(bs, 1024, 3)).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(7)

    def _center(p):
        c = jnp.mean(p[:, :, :3], axis=1)
        return {"zero_mean_pts": p.at[:, :, :3].add(-c[:, None, :]),
                "pts_center": c}

    # ---- cumulative prefixes of pipe._run ----
    def f_geom(p, k):
        return carrier(sa.pts_geometry(_center(p)["zero_mean_pts"]))

    def f_encode(p, k):
        b = _center(p)
        geom = sa.pts_geometry(b["zero_mean_pts"])
        feat, _ = sa._encode_and_score_fn(
            s_state.ema.shadow, s_state.batch_stats, b["zero_mean_pts"],
            train=False, geometry=geom)
        return jnp.sum(feat, axis=1)  # [bs]

    def f_sample(p, k):
        b = _center(p)
        geom = sa.pts_geometry(b["zero_mean_pts"])
        pred = sa._sample_impl(s_state, b, k, repeat_num=K, sampler=sampler,
                               num_steps=cfg.sampling_steps, T0=cfg.T0,
                               geometry=geom)
        return pred[:, 0]  # [bs, pose_dim]

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
        ("offset", lambda p, k: jnp.sum(p, axis=(1, 2)), (bs,)),
        ("geometry", f_geom, (1,)),
        ("score_encode", f_encode, (bs,)),
        ("sampler", f_sample, (bs, 9)),
        ("energy", f_energy, (bs,)),
        ("full_pipeline", f_full, (bs, 7)),
    ]

    times = {}
    for name, fn, shape in prefixes:
        times[name] = _time_chain(fn, pts, key, iters, shape)
        print(json.dumps({"metric": f"prefix_{name}_ms",
                          "value": round(1e3 * times[name], 3)}), flush=True)

    order = [n for n, _, _ in prefixes]
    # the prefix_energy -> prefix_full_pipeline residual is the ranking +
    # top-60% quaternion-pooling tail, not "the full pipeline"
    stage_name = {"full_pipeline": "rank_pool"}
    for prev, cur in zip(order[:-1], order[1:]):
        print(json.dumps({
            "metric": f"stage_{stage_name.get(cur, cur)}_ms",
            "value": round(1e3 * (times[cur] - times[prev]), 3),
        }), flush=True)

    # ---- whole-pipeline MFU via XLA cost analysis ----
    lowered = jax.jit(pipe._run).lower(s_state, e_state, pts, key)
    cost = lowered.compile().cost_analysis()
    if cost:
        flops = flops_from_cost(cost)
        full_t = times["full_pipeline"] - times["offset"]
        mfu = flops / max(full_t, 1e-12) / _peak()
        print(json.dumps({
            "metric": "full_pipeline_mfu",
            "value": round(mfu, 4),
            "flops_per_call": flops,
            "peak_flops": _peak(),
            "poses_per_sec": round(bs / max(full_t, 1e-12), 1),
        }), flush=True)

    # ---- #8: stacked two-trunk encoder A/B ----
    enc_s = s_state.ema.shadow["encoder"]
    enc_e = e_state.params["encoder"]
    stats_s = s_state.batch_stats.get("encoder", {})
    stats_e = e_state.batch_stats.get("encoder", {})
    stacked_p = jax.tree.map(lambda a, b: jnp.stack([a, b]), enc_s, enc_e)
    stacked_s = jax.tree.map(lambda a, b: jnp.stack([a, b]), stats_s, stats_e)
    model = sa.model

    def enc_apply(p, st, zm, geom):
        return model.apply({"params": {"encoder": p},
                            "batch_stats": {"encoder": st}},
                           zm, train=False, geometry=geom,
                           method=GFObjectPose.encode_pts)

    def f_two_encodes(p, k):
        b = _center(p)
        geom = sa.pts_geometry(b["zero_mean_pts"])
        f1 = enc_apply(enc_s, stats_s, b["zero_mean_pts"], geom)
        f2 = enc_apply(enc_e, stats_e, b["zero_mean_pts"], geom)
        return jnp.sum(f1, axis=1) + jnp.sum(f2, axis=1)

    def f_stacked_encode(p, k):
        b = _center(p)
        geom = sa.pts_geometry(b["zero_mean_pts"])
        feats = jax.vmap(lambda pp, st: enc_apply(pp, st, b["zero_mean_pts"],
                                                  geom))(stacked_p, stacked_s)
        return jnp.sum(feats, axis=(0, 2))

    for name, fn in (("two_encodes", f_two_encodes),
                     ("stacked_encode", f_stacked_encode)):
        t = _time_chain(fn, pts, key, iters, (bs,))
        print(json.dumps({"metric": f"ab_{name}_ms",
                          "value": round(1e3 * t, 3)}), flush=True)


if __name__ == "__main__":
    main()
