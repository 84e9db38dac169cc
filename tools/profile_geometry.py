"""Sub-stage profiler for the shared encoder geometry (the serving
pipeline's dominant block: ~6.1 ms of 11.6 ms at bs=64, BASELINE.md r3).

Times cumulative PREFIXES within ``cls_msg_geometry('light')`` — FPS,
each ball query, the grouped-coordinate gathers, then whole stages —
with the same chained-fori_loop technique as ``tools/profile_pipeline.py``
(stable to ~1% over the tunnel).  The geometry is weight-independent, so
no model state is involved.

Run on the real TPU: ``python tools/profile_geometry.py`` (env BENCH_BATCH /
BENCH_ITERS / BENCH_DTYPE).  Prints one JSON line per measurement.
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

from genpose_tpu.utils.benchmarking import carrier, time_chain as _time_chain


def main():
    from genpose_tpu.models.pointnet2 import (
        CLS_MSG_CONFIGS, cls_msg_geometry, sa_geometry)
    from genpose_tpu.ops.pointcloud import (
        ball_query, farthest_point_sample, gather_points, group_points)

    bs = int(os.environ.get("BENCH_BATCH", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "16"))
    dtype = {"bfloat16": jnp.bfloat16,
             "float32": jnp.float32}[os.environ.get("BENCH_DTYPE", "bfloat16")]
    cfgp = CLS_MSG_CONFIGS["light"]

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(bs, 1024, 3)).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(7)

    # ---- within stage 0 (1024 pts -> 512 centers, radii .02/.04) ----
    def f_s0_fps(p, k):
        return carrier(farthest_point_sample(p, 512).astype(jnp.float32))

    def f_s0_centers(p, k):
        idx = farthest_point_sample(p, 512)
        return carrier(gather_points(p, idx))

    def f_s0_q16(p, k):
        idx = farthest_point_sample(p, 512)
        new_xyz = gather_points(p, idx)
        return carrier(ball_query(0.02, 16, p, new_xyz).astype(jnp.float32))

    def f_s0_q32(p, k):
        idx = farthest_point_sample(p, 512)
        new_xyz = gather_points(p, idx)
        g0 = ball_query(0.02, 16, p, new_xyz)
        g1 = ball_query(0.04, 32, p, new_xyz)
        return carrier([g0.astype(jnp.float32), g1.astype(jnp.float32)])

    def f_s0_full(p, k):
        return carrier(sa_geometry(p, 512, cfgp["RADIUS"][0],
                                   cfgp["NSAMPLE"][0], dtype=dtype))

    # ---- cumulative whole stages (stage k consumes stage k-1's centers) ----
    def stage_prefix(n_stages):
        def f(p, k):
            xyz, leaves = p, []
            for s in range(n_stages):
                g = sa_geometry(xyz, cfgp["NPOINTS"][s], cfgp["RADIUS"][s],
                                cfgp["NSAMPLE"][s], dtype=dtype)
                leaves.append(g)
                xyz = g["new_xyz"]
            return carrier(leaves)
        return f

    prefixes = [
        ("offset", lambda p, k: jnp.sum(p, axis=(1, 2)), (bs,)),
        ("s0_fps", f_s0_fps, (1,)),
        ("s0_centers", f_s0_centers, (1,)),
        ("s0_query16", f_s0_q16, (1,)),
        ("s0_query32", f_s0_q32, (1,)),
        ("s0_full", f_s0_full, (1,)),
        ("s01_full", stage_prefix(2), (1,)),
        ("s012_full", stage_prefix(3), (1,)),
        ("geometry_full", lambda p, k: carrier(
            cls_msg_geometry(p, "light", dtype=dtype)), (1,)),
    ]

    times = {}
    for name, fn, shape in prefixes:
        times[name] = _time_chain(fn, pts, key, iters, shape)
        print(json.dumps({"metric": f"prefix_{name}_ms",
                          "value": round(1e3 * times[name], 3)}), flush=True)

    order = [n for n, _, _ in prefixes]
    for prev, cur in zip(order[:-1], order[1:]):
        print(json.dumps({
            "metric": f"delta_{cur}_ms",
            "value": round(1e3 * (times[cur] - times[prev]), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
