"""s0-geometry composition variants: where does the 1.28 ms attributed to
the (r=.04, n=32) query in tools/profile_geometry.py actually come from?

Isolated ball-query kernels are ~free (tools/bench_ballquery.py), so the
cost must be an interaction (plane prep, scheduling, or the grouped
gathers).  Times each variant twice to bound per-program noise.

Run on the real TPU: ``python tools/bench_s0_variants.py``.
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
    from genpose_tpu.ops.pointcloud import (
        ball_query, farthest_point_sample, gather_points, group_points)

    bs = int(os.environ.get("BENCH_BATCH", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "16"))
    dt = jnp.bfloat16

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(bs, 1024, 3)).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(7)
    prec = jax.lax.Precision.DEFAULT

    def base(p):
        idx = farthest_point_sample(p, 512)
        return gather_points(p, idx)

    def v_base(p, k):
        return carrier(base(p))

    def v_q16(p, k):
        nx = base(p)
        return carrier([nx, ball_query(0.02, 16, p, nx).astype(jnp.float32)])

    def v_q32_only(p, k):
        nx = base(p)
        return carrier([nx, ball_query(0.04, 32, p, nx).astype(jnp.float32)])

    def v_both(p, k):
        nx = base(p)
        return carrier([nx, ball_query(0.02, 16, p, nx).astype(jnp.float32),
                        ball_query(0.04, 32, p, nx).astype(jnp.float32)])

    def v_g16(p, k):
        nx = base(p)
        gi = ball_query(0.02, 16, p, nx)
        g = (group_points(p, gi, precision=prec) - nx[:, :, None, :]).astype(dt)
        return carrier([nx, g])

    def v_g32(p, k):
        nx = base(p)
        gi = ball_query(0.04, 32, p, nx)
        g = (group_points(p, gi, precision=prec) - nx[:, :, None, :]).astype(dt)
        return carrier([nx, g])

    def v_full(p, k):
        nx = base(p)
        leaves = [nx]
        for r, s in ((0.02, 16), (0.04, 32)):
            gi = ball_query(r, s, p, nx)
            leaves.append(
                (group_points(p, gi, precision=prec)
                 - nx[:, :, None, :]).astype(dt))
        return carrier(leaves)

    offs = _time_chain(lambda p, k: jnp.sum(p, axis=(1, 2)), pts, key, iters,
                       (bs,))
    print(json.dumps({"metric": "offset_ms", "value": round(1e3 * offs, 3)}),
          flush=True)
    for name, fn in (("base_fps_centers", v_base), ("plus_q16", v_q16),
                     ("plus_q32_only", v_q32_only), ("plus_both_queries", v_both),
                     ("q16_plus_gather", v_g16), ("q32_plus_gather", v_g32),
                     ("s0_full", v_full)):
        for rep in range(2):
            t = _time_chain(fn, pts, key, iters, (1,))
            print(json.dumps({
                "metric": f"s0_{name}_ms", "rep": rep,
                "value": round(1e3 * (t - offs), 3),
            }), flush=True)


if __name__ == "__main__":
    main()
