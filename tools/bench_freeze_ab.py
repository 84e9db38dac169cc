"""Same-session freeze-vs-args A/B of the serving pipeline (VERDICT r3 #5).

Round 3 left a puzzle: ``freeze()`` (weights baked as XLA constants) wins
~24% on the adaptive-RK45 pipeline (3277 -> 4073 poses/s) but frozen
Heun-500 read 1829 vs round 2's args-program 1800 — <=2%.  The two numbers
came from different rounds/harnesses, so the null result could be real
(the frozen 500-step scan lowers no better) or cross-round drift.  This
tool times BOTH programs for a given sampler in ONE process on the same
HEAD: the frozen pipeline (states closed over -> constants) and the args
pipeline (states passed as jit arguments), each as a chained fori_loop
(``utils/benchmarking.time_chain`` technique, ~1% stable).

Run on the real TPU: ``BENCH_SAMPLER=ode python tools/bench_freeze_ab.py``
(env BENCH_BATCH / BENCH_K / BENCH_STEPS / BENCH_ITERS).  Prints one JSON
line per arm.
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

from genpose_tpu.utils.benchmarking import derandomize_state, time_chain


def main():
    from genpose_tpu.config import Config
    from genpose_tpu.runners.serving import InferencePipeline

    bs = int(os.environ.get("BENCH_BATCH", "64"))
    K = int(os.environ.get("BENCH_K", "50"))
    steps = int(os.environ.get("BENCH_STEPS", "500"))
    iters = int(os.environ.get("BENCH_ITERS", "16"))
    sampler = os.environ.get("BENCH_SAMPLER", "ode")

    cfg = Config(num_points=1024, eval_repeat_num=K, sampling_steps=steps,
                 batch_size=bs, compute_dtype="bfloat16", T0=0.55,
                 sampler_mode=(sampler,))
    pipe = InferencePipeline(cfg, batch_size=bs)
    # distinct seeds: same-seed agents CSE the duplicate frozen energy trunk
    # (BASELINE.md r3 post-mortem)
    pipe.score_agent.state = derandomize_state(pipe.score_agent.state)
    pipe.energy_agent.state = derandomize_state(pipe.energy_agent.state,
                                                seed=43)
    ss, es = pipe.score_agent.state, pipe.energy_agent.state

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(bs, 1024, 3)).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(1)
    tag = "rk45" if sampler == "ode_adaptive" else f"ode{steps}"

    # ---- arm 1: weights as ARGUMENTS (states are jit parameters) ----
    run = pipe._run

    @jax.jit
    def chained_args(ss, es, pts, key, n):
        def it(i, carry):
            p = pts + 1e-12 * jnp.sum(carry)
            out = run(ss, es, p, jax.random.fold_in(key, i))["pred_pose"]
            return jnp.asarray(out, jnp.float32)

        return jax.lax.fori_loop(0, n, it, jnp.zeros((bs, 7)))

    np.asarray(chained_args(ss, es, pts, key, jnp.int32(iters)))
    t0 = time.perf_counter()
    np.asarray(chained_args(ss, es, pts, key, jnp.int32(iters)))
    t_args = (time.perf_counter() - t0) / iters
    print(json.dumps({"metric": f"args_{tag}_ms",
                      "value": round(1e3 * t_args, 3),
                      "poses_per_sec": round(bs / t_args, 1)}), flush=True)

    # ---- arm 2: FROZEN (states closed over -> XLA constants) ----
    pipe.freeze()
    t_frozen = time_chain(lambda p, k: pipe._run_frozen(p, k)["pred_pose"],
                          pts, key, iters, (bs, 7))
    print(json.dumps({"metric": f"frozen_{tag}_ms",
                      "value": round(1e3 * t_frozen, 3),
                      "poses_per_sec": round(bs / t_frozen, 1)}), flush=True)

    print(json.dumps({"metric": f"freeze_win_{tag}",
                      "value": round(t_args / t_frozen - 1.0, 4)}), flush=True)


if __name__ == "__main__":
    main()
