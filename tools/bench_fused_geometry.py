"""A/B: fused FPS+ball-query kernel vs the separate kernels (VERDICT r4 #7).

Times, at each MSG stage shape (and at the whole 3-stage geometry chain),
the production composition fps -> centers gather -> 2x ball_query against
``fps_bq_fused`` — the candidate saving is the per-center distance row the
standalone BQ recomputes (~10-15% of BQ per BASELINE r3 attribution) plus
the centers-gather input traffic; the candidate risk is the BQ rows running
batch-wide (64 rows/round) inside the sequential FPS loop instead of
256-wide in their own grid.

Run on the real TPU: ``python tools/bench_fused_geometry.py``.
Decision rule (VERDICT r4 #7): reject quickly if <10% on the geometry block.
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

from genpose_tpu.utils.benchmarking import time_chain_marginal

# the three FPS+BQ MSG stages of ClsMSG 'light' (models/pointnet2.py)
STAGES = (
    ("s0", 1024, 512, (0.02, 0.04), (16, 32)),
    ("s1", 512, 256, (0.04, 0.08), (16, 32)),
    ("s2", 256, 128, (0.08, 0.16), (16, 32)),
)


def main():
    from genpose_tpu.ops.fps_bq_fused import fps_bq_fused
    from genpose_tpu.ops.pointcloud import (
        ball_query,
        farthest_point_sample,
        gather_points,
    )

    bs = int(os.environ.get("BENCH_BATCH", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "16"))

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(bs, 1024, 3)).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(7)

    def report(name, f):
        t, _env = time_chain_marginal(f, pts, key, iters, (bs,))
        print(json.dumps({"metric": name, "value": round(1e3 * t, 3),
                          "unit": "ms"}), flush=True)
        return t

    results = {}
    for tag, N, M, radii, nsamples in STAGES:
        def sep(p, k, N=N, M=M, radii=radii, nsamples=nsamples):
            x = p[:, :N, :]
            fi = farthest_point_sample(x, M)
            centers = gather_points(x, fi)
            acc = jnp.sum(centers, axis=(1, 2))
            for r, s in zip(radii, nsamples):
                acc = acc + jnp.sum(ball_query(r, s, x, centers),
                                    axis=(1, 2)).astype(jnp.float32)
            return acc

        def fused(p, k, N=N, M=M, radii=radii, nsamples=nsamples):
            x = p[:, :N, :]
            fi, bq = fps_bq_fused(x, M, radii, nsamples)
            # production still gathers the centers for the SharedMLP's
            # relative coords — keep it in the fused arm for honesty
            centers = gather_points(x, fi)
            acc = jnp.sum(centers, axis=(1, 2))
            for b in bq:
                acc = acc + jnp.sum(b, axis=(1, 2)).astype(jnp.float32)
            return acc

        results[f"{tag}_separate"] = report(f"{tag}_separate_ms", sep)
        results[f"{tag}_fused"] = report(f"{tag}_fused_ms", fused)

    # whole 3-stage chain (each stage's input = previous centers), both ways
    def chain(p, k, use_fused: bool):
        x = p
        acc = jnp.zeros((p.shape[0],), jnp.float32)
        for tag, N, M, radii, nsamples in STAGES:
            if use_fused:
                fi, bq = fps_bq_fused(x, M, radii, nsamples)
                centers = gather_points(x, fi)
                for b in bq:
                    acc = acc + jnp.sum(b, axis=(1, 2)).astype(jnp.float32)
            else:
                fi = farthest_point_sample(x, M)
                centers = gather_points(x, fi)
                for r, s in zip(radii, nsamples):
                    acc = acc + jnp.sum(ball_query(r, s, x, centers),
                                        axis=(1, 2)).astype(jnp.float32)
            x = centers
        return acc + jnp.sum(x, axis=(1, 2))

    t_sep = report("chain_separate_ms", lambda p, k: chain(p, k, False))
    t_fus = report("chain_fused_ms", lambda p, k: chain(p, k, True))
    win = (t_sep - t_fus) / t_sep * 100.0
    print(json.dumps({"metric": "chain_fused_win_pct",
                      "value": round(win, 2)}), flush=True)


if __name__ == "__main__":
    main()
