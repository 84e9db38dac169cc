"""Headline benchmark: full GenPose inference throughput (poses/sec).

Workload = the reference's eval configuration (BASELINE.md): a batch of
segmented object point clouds -> PointNet++ encoding -> K=50 pose
hypotheses via the PF-ODE sampler -> EnergyNet scoring -> energy sort +
top-60% quaternion-average pooling.  Everything after the host->device
copy is jitted; "poses" = object instances, each with K=50 candidates
(the reference counts the same way).

The default integrator is the on-device adaptive RK45 at atol/rtol 1e-5 —
the reference's released eval path (``scripts/eval_single.sh`` sets no
``--sampling_steps``, so ``samplers.py:205`` integrates adaptively).  Set
BENCH_SAMPLER=ode for the fixed-step Heun-``BENCH_STEPS`` variant.

The pipeline runs FROZEN (``InferencePipeline.freeze``): weights baked into
the XLA program as constants, exactly as a pinned-weight deployment serves.
Round-4 same-session A/B: freezing itself is within noise (+0.1-0.8%) —
the pipeline is measured frozen because that is the deployment shape, not
for speed (bench_evidence/onchip_r4/freeze_ab_*.jsonl, BASELINE.md r4).

Baseline: the reference publishes NO throughput numbers (BASELINE.md).  The
``vs_baseline`` field is measured against an ESTIMATE of the torch reference
on its RTX 3090: scipy RK45 with host round-trips every step
(``samplers.py:183-198``), ~600 score evals per solve at bs*K=12800, ~60
poses/sec end to end.  The north-star target is >10x that (>600 poses/sec).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os

import jax

# persistent compile cache: the pipeline takes minutes to compile on this
# host; repeat runs (and the driver's) hit the cache instead
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("BENCH_CACHE", "/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

BASELINE_POSES_PER_SEC = 60.0  # estimated RTX-3090 reference throughput


def _require_backend(timeout_s: int = 300):
    """Fail fast if the (tunneled) backend is unreachable: a dead relay
    makes the first device op hang indefinitely, which would stall the
    driver's bench run for hours instead of reporting an error."""
    import sys
    import threading

    done = threading.Event()

    def probe():
        x = jnp.ones((2, 2))
        np.asarray(x @ x)
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s):
        print(f"bench.py: backend unreachable after {timeout_s}s "
              "(tunnel down?) — aborting without a metric line",
              file=sys.stderr, flush=True)
        os._exit(3)


def main():
    from genpose_tpu.config import Config
    from genpose_tpu.runners.serving import InferencePipeline

    _require_backend()

    bs = int(os.environ.get("BENCH_BATCH", "64"))
    K = int(os.environ.get("BENCH_K", "50"))
    steps = int(os.environ.get("BENCH_STEPS", "500"))
    iters = int(os.environ.get("BENCH_ITERS", "32"))
    sampler = os.environ.get("BENCH_SAMPLER", "ode_adaptive")

    # the benchmark measures the REAL serving pipeline (InferencePipeline's
    # jitted _run: shared geometry -> K-hypothesis sampling -> energy ->
    # rank -> top-cfg.ratio pooling), not a re-implementation that could
    # drift from it
    cfg = Config(num_points=1024, eval_repeat_num=K, sampling_steps=steps,
                 batch_size=bs, compute_dtype="bfloat16", T0=0.55,
                 sampler_mode=(sampler,))
    pipe = InferencePipeline(cfg, batch_size=bs)
    score_agent = pipe.score_agent
    energy_agent = pipe.energy_agent

    # The reference zero-initializes each tail's last layer (scorenet.py:
    # 120-135), so a fresh net computes score = 0 and XLA constant-folds the
    # whole ODE scan away.  Perturb every parameter so the benchmark measures
    # the real trained-model compute graph, not a dead-code-eliminated one.
    from genpose_tpu.utils.benchmarking import derandomize_state

    score_agent.state = derandomize_state(score_agent.state)
    # DISTINCT seed: both agents init the same encoder subtree from
    # PRNGKey(cfg.seed), so a same-seed perturbation leaves the two encoder
    # weight trees bit-identical — and once freeze() bakes them as
    # constants, XLA CSEs the entire energy encoder trunk away (verified:
    # compiled FLOPs halve), inflating the measured throughput vs any real
    # deployment whose checkpoints differ.
    energy_agent.state = derandomize_state(energy_agent.state, seed=43)
    # Serving deployments pin their weights, so measure the frozen program
    # (the deployment shape; round-4 A/B puts the freeze win itself within
    # noise — BASELINE.md r4).  tests/test_serving.py's
    # test_frozen_flops_cse_canary guards the program shape.
    pipe.freeze()

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(bs, cfg.num_points, 3)).astype(np.float32) * 0.1)

    # One jitted program runs `iters` end-to-end pipelines chained through a
    # data dependence (each iteration's input depends on the previous
    # iteration's pooled poses), so the DEVICE must serialize them — honest
    # per-iteration time.  The chain lives inside a fori_loop in ONE program
    # because per-iteration dispatch over the tunneled backend costs a
    # ~20-35 ms RPC (round-2 measurement: 3-dispatch chaining reads ~1830
    # poses/s where the device actually sustains ~2840) — host/tunnel
    # overhead a real deployment overlaps with compute, not device time.
    # ``time_chain_marginal`` (shared with tools/profile_*.py so the
    # technique cannot drift) syncs via a host copy (block_until_ready alone
    # is unreliable over the tunnel), keeps the trip count TRACED (a static
    # n=32 bound made the same program compile 21-28 min vs ~5 min,
    # CLAUDE.md), and times the SAME executable at n and 2n trips — the
    # difference cancels the fixed per-dispatch envelope (~22-30 ms tunnel
    # RPC + sync; at 32 iters that is ~0.7-0.9 ms/iter = ~5% inflation a
    # plain per-iter reading would carry; round-4 method change, matching
    # the bs=1 correction in BASELINE.md r4).  Heads are perturbed above so
    # XLA cannot constant-fold the sampler.  pipe._run_frozen inlines under
    # the jit; outputs other than pred_pose are dead-code-eliminated.
    from genpose_tpu.utils.benchmarking import time_chain_marginal

    sec_per_iter, envelope = time_chain_marginal(
        lambda p, k: pipe._run_frozen(p, k)["pred_pose"],
        pts, jax.random.PRNGKey(1), iters, (bs, 7))

    poses_per_sec = bs / sec_per_iter
    tag = "rk45" if sampler == "ode_adaptive" else f"ode{steps}"
    print(json.dumps({
        "metric": f"inference_poses_per_sec_K{K}_{tag}",
        "value": round(poses_per_sec, 2),
        "unit": "poses/s",
        "vs_baseline": round(poses_per_sec / BASELINE_POSES_PER_SEC, 2),
        "dispatch_envelope_ms": round(1e3 * envelope, 1),
    }))


if __name__ == "__main__":
    main()
