"""End-to-end trainer throughput: loader + process_batch + train_step,
overlapped, measured — not extrapolated (VERDICT r3 #4).

Round 3 measured the loader (95 samples/s/core) and the train step (1,540
samples/s) separately and CLAIMED "not input-bound on a >=16-core host" by
multiplication.  This tool runs the ACTUAL production pieces end to end on
a synthetic NOCS tree at the reference shapes (bs=192, 1024 pts, repeat 20)
and reports, in one session:

1. ``loader_only``   — sustained raw-batch rate of the real ``DataLoader``
   (process workers), full warm epoch;
2. ``step_only``     — the dispatched train-step rate on a resident batch
   (per-step host dispatch included — the rate the real loop sees, unlike
   the fori_loop profiler's net device time);
3. ``trainer_e2e``   — the REAL ``train_score`` loop via ``trainer.main``
   (incl. process_batch, EMA-loss probes, logging), warm epochs only;
4. ``serial_pred``   — 1/(1/loader + 1/step): what e2e would read if the
   prefetch queue did NOT overlap host and device work.

On this 1-CPU dev VM training is loader-bound, so the pass criterion is
``trainer_e2e ~= loader_only`` (the queue hides the device step behind host
decode), NOT the step ceiling.  Run on the real TPU:
``python tools/bench_trainer_e2e.py`` (env E2E_SCENES / E2E_EPOCHS /
E2E_BS / E2E_WORKERS).  Prints one JSON line per measurement.
"""

import json
import os
import sys
import tempfile
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("BENCH_CACHE", "/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def main():
    from genpose_tpu.config import get_config
    from genpose_tpu.data.loader import get_data_loaders_from_cfg
    from genpose_tpu.data.process import process_batch
    from genpose_tpu.data.synthetic import make_synthetic_nocs_dir
    from genpose_tpu.training.agent import PoseAgent

    bs = int(os.environ.get("E2E_BS", "192"))
    n_camera = int(os.environ.get("E2E_SCENES", "720"))
    n_epochs = int(os.environ.get("E2E_EPOCHS", "4"))
    workers = int(os.environ.get("E2E_WORKERS", "1"))

    root = tempfile.mkdtemp(prefix="e2e_nocs_")
    t0 = time.perf_counter()
    make_synthetic_nocs_dir(root, n_camera_scenes=n_camera,
                            n_real_scenes=max(2, n_camera // 9), n_models=3)
    print(json.dumps({"metric": "synthetic_tree_s",
                      "value": round(time.perf_counter() - t0, 1),
                      "camera_scenes": n_camera}), flush=True)

    flags = ["--agent_type", "score", "--data_path", root,
             "--is_train", "true", "--batch_size", str(bs),
             "--mini_bs", str(min(bs, 32)), "--num_points", "1024",
             "--repeat_num", "20", "--num_workers", str(workers),
             "--loader_mode", "process", "--eval_freq", "1000",
             "--n_epochs", str(n_epochs), "--log_dir", "e2e_bench",
             "--warmup", "100"]
    cfg = get_config(flags)

    # ---- arm 1: loader-only sustained rate (real DataLoader, warm) ----
    loaders = get_data_loaders_from_cfg(cfg, ["train"])
    train_loader = loaders["train_loader"]
    n_batches = len(train_loader)
    for _ in train_loader:  # warm the workers / page cache
        break
    t0 = time.perf_counter()
    seen = 0
    for raw in train_loader:
        seen += raw["pcl_in"].shape[0]
    dt = time.perf_counter() - t0
    loader_rate = seen / dt
    print(json.dumps({"metric": "loader_only_samples_per_s",
                      "value": round(loader_rate, 1), "batches": n_batches,
                      "samples": seen}), flush=True)

    # ---- arm 2: dispatched train-step rate on a resident batch ----
    raw = next(iter(train_loader))
    key = jax.random.PRNGKey(0)
    agent = PoseAgent(cfg, "score", steps_per_epoch=max(1, n_batches))
    batch = process_batch(raw, cfg.pose_mode, key, cfg.pts_aug)
    losses = agent.train_step(batch, key)  # compile + warm
    float(losses["gf"])
    n_steps = 20
    t0 = time.perf_counter()
    for i in range(n_steps):
        losses = agent.train_step(batch, jax.random.fold_in(key, i))
    float(losses["gf"])  # drain the dispatch queue
    dt = time.perf_counter() - t0
    step_rate = n_steps * bs / dt
    print(json.dumps({"metric": "step_only_samples_per_s",
                      "value": round(step_rate, 1),
                      "step_ms": round(1e3 * dt / n_steps, 1)}), flush=True)
    loaders["train_loader"].close()
    del agent, batch, raw, losses

    # ---- arm 3: the REAL trainer loop (fresh process state not needed:
    # trainer.main builds its own loaders/agent; epoch walls come from the
    # metrics.jsonl epoch_time_s rows the production loop already logs) ----
    from genpose_tpu.runners import trainer as trainer_mod

    t0 = time.perf_counter()
    trainer_mod.main(flags)
    total = time.perf_counter() - t0

    log_path = os.path.join("results", "logs", "e2e_bench", "metrics.jsonl")
    epoch_walls = []
    with open(log_path) as f:
        for line in f:
            row = json.loads(line)
            if row["tag"] == "epoch_time_s":
                epoch_walls.append((row["step"], row["value"]))
    # warm epochs only: epoch 1 pays the train_step + EMA-probe compiles
    warm = [v for e, v in epoch_walls[1:]]
    samples_per_epoch = n_batches * bs
    e2e = samples_per_epoch / (sum(warm) / len(warm)) if warm else 0.0
    print(json.dumps({"metric": "trainer_e2e_samples_per_s",
                      "value": round(e2e, 1),
                      "warm_epochs": len(warm),
                      "epoch_walls_s": [round(v, 1) for _, v in epoch_walls],
                      "total_wall_s": round(total, 1)}), flush=True)

    # ---- arm 4: the no-overlap (serial) prediction from arms 1+2 ----
    serial = 1.0 / (1.0 / loader_rate + 1.0 / step_rate)
    print(json.dumps({"metric": "serial_pred_samples_per_s",
                      "value": round(serial, 1),
                      "overlap_hides_pct": round(
                          100.0 * (e2e / serial - 1.0), 1) if e2e else None,
                      }), flush=True)


if __name__ == "__main__":
    main()
