"""Stage-level TRAIN-step profiler + train-step MFU.

Times cumulative prefixes of the score-DSM training step (encoder forward ->
loss forward -> backward -> optimizer update) at the reference config
(bs=192, repeat 20, 1024 pts — ``scripts/train_score.sh``) with the same
fori_loop chain technique as ``tools/profile_pipeline.py`` (stable ~1% over
the tunnel; empty-chain offset measured separately and subtracted).
Train-step FLOPs come from XLA cost_analysis of the compiled update,
giving an MFU against the chip's peak (training runs f32 gathers + f32
params; peak is taken as the bf16 MXU peak so the number is conservative
and comparable with the serving MFU).

Run on the real TPU: ``python tools/profile_train.py`` (env TRAIN_BATCH /
TRAIN_REPEAT / BENCH_ITERS).  Prints one JSON line per measurement.
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
    derandomize_state, flops_from_cost, peak_flops as _peak, time_chain)


def _time_chain(fn, pts, gt, key, iters, carrier_shape):
    # close over gt so the shared 2-arg chain timer applies
    return time_chain(lambda p, k: fn(p, gt, k), pts, key, iters,
                      carrier_shape)


def main():
    from genpose_tpu.config import Config
    from genpose_tpu.training.agent import PoseAgent

    bs = int(os.environ.get("TRAIN_BATCH", "192"))
    repeat = int(os.environ.get("TRAIN_REPEAT", "20"))
    npts = int(os.environ.get("TRAIN_POINTS", "1024"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    dtype = os.environ.get("TRAIN_DTYPE", "float32")

    cfg = Config(num_points=npts, batch_size=bs, repeat_num=repeat,
                 compute_dtype=dtype,
                 head_dtype=os.environ.get("HEAD_DTYPE", "compute"),
                 bn_dtype=os.environ.get("BN_DTYPE", "compute"),
                 geometry_dtype=os.environ.get("GEOM_DTYPE", "compute"),
                 encoder_f32_stages=int(os.environ.get("F32_STAGES", "0")),
                 gather_grad=os.environ.get("GATHER_GRAD", "exact"),
                 gather_fwd=os.environ.get("GATHER_FWD", "exact"))
    agent = PoseAgent(cfg, "score")

    # perturb so XLA cannot constant-fold the zero-init heads
    agent.state = derandomize_state(agent.state)
    state = agent.state

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(bs, npts, 3)).astype(np.float32) * 0.1)
    gt = jnp.asarray(rng.normal(size=(bs, agent.pose_dim)).astype(np.float32))

    def f_encode(p, g, k):
        feat, _ = agent._encode_and_score_fn(
            state.params, state.batch_stats, p, train=True)
        return jnp.sum(feat, axis=1)  # [bs]

    def f_loss(p, g, k):
        feat, new_stats = agent._encode_and_score_fn(
            state.params, state.batch_stats, p, train=True)
        loss = agent._gf_loss(state.params, new_stats, feat, k, g)
        return loss * jnp.ones((1,))

    def f_grad(p, g, k):
        def loss_fn(params):
            feat, new_stats = agent._encode_and_score_fn(
                params, state.batch_stats, p, train=True)
            return agent._gf_loss(params, new_stats, feat, k, g), new_stats
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return (loss + 1e-12 * sum(jnp.sum(jnp.asarray(x, jnp.float32))
                                   for x in jax.tree.leaves(grads))
                ) * jnp.ones((1,))

    def f_step(p, g, k):
        batch = {"zero_mean_pts": p, "zero_mean_gt_pose": g}
        new_state, losses = agent._train_step_score_impl(state, batch, k)
        return (losses["gf"] + 1e-12 * sum(
            jnp.sum(jnp.asarray(x, jnp.float32))
            for x in jax.tree.leaves(new_state.params))) * jnp.ones((1,))

    prefixes = [
        ("offset", lambda p, g, k: jnp.sum(p, axis=(1, 2)), (bs,)),
        ("encode_fwd", f_encode, (bs,)),
        ("loss_fwd", f_loss, (1,)),
        ("backward", f_grad, (1,)),
        ("full_step", f_step, (1,)),
    ]

    key = jax.random.PRNGKey(7)
    times = {}
    for name, fn, shape in prefixes:
        times[name] = _time_chain(fn, pts, gt, key, iters, shape)
        print(json.dumps({"metric": f"prefix_{name}_ms",
                          "value": round(1e3 * times[name], 3)}), flush=True)

    order = [n for n, _, _ in prefixes]
    for prev, cur in zip(order[:-1], order[1:]):
        print(json.dumps({
            "metric": f"stage_{cur}_ms",
            "value": round(1e3 * (times[cur] - times[prev]), 3),
        }), flush=True)

    net = times["full_step"] - times["offset"]
    print(json.dumps({"metric": "train_samples_per_sec",
                      "value": round(bs / max(net, 1e-12), 1)}), flush=True)

    def step_for_cost(state, p, g, k):
        batch = {"zero_mean_pts": p, "zero_mean_gt_pose": g}
        return agent._train_step_score_impl(state, batch, k)

    cost = jax.jit(step_for_cost).lower(state, pts, gt, key).compile(
        ).cost_analysis()
    if cost:
        flops = flops_from_cost(cost)
        print(json.dumps({
            "metric": "train_step_mfu",
            "value": round(flops / max(net, 1e-12) / _peak(), 4),
            "flops_per_step": flops,
            "peak_flops": _peak(),
        }), flush=True)


if __name__ == "__main__":
    main()
