"""Input-pipeline throughput benchmark (VERDICT r2 weak #4).

Measures, on a synthetic NOCS tree with real png/pkl decode + crop + DZI +
depth->pcl + native preprocess per sample:

- raw single-thread ``NOCSDataset.__getitem__`` latency (per-sample host
  cost -> cores needed to feed the measured train step),
- sustained ``DataLoader`` samples/s for the thread pool and the process
  pool at several worker counts.

Usage: ``python tools/bench_loader.py [--scenes 24] [--num-points 1024]
[--batch-size 192] [--workers 1 2 4 8] [--modes thread process]``.
Prints one JSON line per configuration.  Forces the CPU backend (the loader
never touches the device; jax is only imported transitively).
"""

import jax

jax.config.update("jax_platforms", "cpu")

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from genpose_tpu.config import Config  # noqa: E402
from genpose_tpu.data.loader import DataLoader  # noqa: E402
from genpose_tpu.data.nocs import NOCSDataset  # noqa: E402
from genpose_tpu.data.synthetic import make_synthetic_nocs_dir  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=24)
    ap.add_argument("--num-points", type=int, default=1024)
    ap.add_argument("--batch-size", type=int, default=192)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--modes", nargs="+", default=["thread", "process"])
    ap.add_argument("--min-seconds", type=float, default=8.0)
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix="loaderbench_")
    make_synthetic_nocs_dir(root, n_camera_scenes=args.scenes,
                            n_real_scenes=max(2, args.scenes // 3), seed=5)
    cfg = Config()
    ds = NOCSDataset(data_dir=root, source="CAMERA+Real", mode="train",
                     n_pts=args.num_points, img_size=cfg.img_size,
                     dzi_params=cfg.dzi, deform_2d_params=cfg.deform_2d)

    # raw single-thread per-sample cost
    ds[0]  # warm caches (model pkls etc.)
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < args.min_seconds:
        ds[n % len(ds)]
        n += 1
    dt = time.perf_counter() - t0
    raw = {"metric": "getitem_single_thread", "samples_per_s": n / dt,
           "ms_per_sample": 1e3 * dt / n, "n": n}
    print(json.dumps(raw), flush=True)

    for mode in args.modes:
        for w in args.workers:
            loader = DataLoader(ds, batch_size=args.batch_size, shuffle=True,
                                num_workers=w, workers_mode=mode, seed=1)
            # the clock starts when the FIRST batch arrives and that batch is
            # NOT counted: its production time (including the one-off pool
            # fork — the pool persists across epochs) lies outside the
            # measured window, so counting it would inflate the rate
            seen, t0, t_first = 0, time.perf_counter(), None
            t_end = t0
            while time.perf_counter() - t0 < args.min_seconds:
                for batch in loader:
                    if t_first is None:
                        t_first = time.perf_counter()
                        continue
                    seen += batch["pcl_in"].shape[0]
                    # window closes at the last COUNTED batch: breaking out
                    # of the loop tears the generator down (joins the
                    # producer mid-batch), and that uncounted tail would
                    # otherwise deflate the rate
                    t_end = time.perf_counter()
                    if t_end - t0 > args.min_seconds:
                        break
            dt = t_end - (t_first or t0)
            loader.close()
            print(json.dumps({
                "metric": "loader_sustained", "mode": mode, "workers": w,
                "samples_per_s": seen / max(dt, 1e-9), "batch": args.batch_size,
                "num_points": args.num_points, "nproc": os.cpu_count(),
            }), flush=True)


if __name__ == "__main__":
    main()
