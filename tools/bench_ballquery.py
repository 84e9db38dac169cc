"""Isolated ball-query microbench: separate the radius / nsample effects.

The geometry sub-profiler (tools/profile_geometry.py) reads ~0 ms for the
s0 (r=.02, n=16) query but 1.28 ms for (r=.04, n=32) — this times each
(radius, nsample) combination at the s0 shape (B=64, N=1024, M=512) in
isolation, plus the XLA oracle for reference.

Run on the real TPU: ``python tools/bench_ballquery.py``.
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

from genpose_tpu.utils.benchmarking import time_chain as _time_chain


def main():
    from genpose_tpu.ops.ball_query_pallas import ball_query_pallas
    from genpose_tpu.ops.pointcloud import ball_query_ref

    bs = int(os.environ.get("BENCH_BATCH", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "16"))

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(bs, 1024, 3)).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(7)

    offs = _time_chain(lambda p, k: jnp.sum(p, axis=(1, 2)), pts, key, iters,
                       (bs,))
    print(json.dumps({"metric": "offset_ms", "value": round(1e3 * offs, 3)}),
          flush=True)

    for impl_name, impl in (("pallas", ball_query_pallas),
                            ("xla", ball_query_ref)):
        for radius in (0.02, 0.04):
            for nsample in (16, 32):
                def f(p, k, radius=radius, nsample=nsample, impl=impl):
                    gi = impl(radius, nsample, p, p[:, :512, :])
                    return jnp.sum(gi, axis=(1, 2)).astype(jnp.float32)
                t = _time_chain(f, pts, key, iters, (bs,))
                print(json.dumps({
                    "metric": f"bq_{impl_name}_r{radius}_s{nsample}_ms",
                    "value": round(1e3 * (t - offs), 3),
                }), flush=True)


if __name__ == "__main__":
    main()
