"""Thread-pool prefetching data loader (replaces torch DataLoader).

The reference feeds the GPU via 32 torch worker *processes*
(``datasets_genpose.py:558-566``).  On TPU hosts the natural shape is a
thread pool: cv2 releases the GIL for decode/warp, numpy collate is cheap,
and batches are handed to one fused jitted ``process_batch`` on device.
A bounded prefetch queue keeps a couple of batches in flight so host IO
overlaps device compute.

Also reproduces the CAMERA:Real = 3:1 epoch resampling
(``datasets_genpose.py:545-556``).
"""

from __future__ import annotations

import multiprocessing
import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

# Process-worker plumbing: each worker holds its own dataset copy (installed
# once by the pool initializer) and fetches by (index, visit).  Sample
# content is bit-identical across thread/process modes BY CONSTRUCTION for
# datasets exposing ``fetch(index, visit)`` (process mode REQUIRES it —
# enforced in ``DataLoader.__init__``): the parent assigns the visit
# (augmentation-draw) number per dispatch and the dataset derives its RNG
# from (seed, index, visit) — worker-local counters would reset on every
# fork and repeat the augmentation stream each epoch.  Thread mode accepts
# plain ``__getitem__`` datasets as well (single in-process counter).
_worker_dataset = None


def _init_worker(dataset) -> None:
    global _worker_dataset
    _worker_dataset = dataset


def _fetch(index: int, visit: int):
    return _worker_dataset.fetch(int(index), int(visit))


def collate(samples: Sequence[Dict]) -> Dict[str, np.ndarray]:
    """Stack a list of sample dicts into batched numpy arrays."""
    out: Dict[str, np.ndarray] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], str):
            out[key] = vals  # e.g. 'path'
        else:
            out[key] = np.stack([np.asarray(v) for v in vals], axis=0)
    return out


def camera_real_indices(subset_len: List[int], percentage_data: float,
                        rng: np.random.Generator) -> np.ndarray:
    """CAMERA:Real 3:1 resampled index list (ref ``datasets_genpose.py:545-556``)."""
    camera_len, real_len = subset_len
    real_indices = list(range(camera_len, camera_len + real_len))
    camera_indices = list(range(camera_len))
    n_repeat = max((camera_len // 3 - real_len) // max(real_len, 1), 0)
    idx = camera_indices + real_indices * n_repeat
    rng.shuffle(idx)
    size = int(percentage_data * len(idx))
    return np.asarray(idx[:size])


class DataLoader:
    """Minimal map-style loader: shuffling, threaded fetch, bounded prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 8,
        drop_last: bool = False,
        indices: Optional[np.ndarray] = None,
        prefetch: int = 2,
        seed: int = 0,
        workers_mode: str = "thread",
    ):
        """``workers_mode``: 'thread' (default — cv2/np release the GIL for
        the heavy decode/warp work) or 'process' (the reference's
        num_workers=32 *process* shape, ``datasets_genpose.py:558-566``, for
        hosts where the Python-level share of ``__getitem__`` GIL-bounds the
        thread pool).  Process workers use fork: this image's sitecustomize
        imports jax (and dials the axon tunnel) in every freshly-spawned
        interpreter, so spawn-mode children would pay seconds of startup;
        forked children run only numpy/cv2 and never touch the inherited
        jax state.  The pool is created ONCE, lazily, from the consumer
        thread at the first ``__iter__`` and reused across epochs — forking
        per epoch from the producer thread would both repeat the pool
        startup cost every epoch and raise the inherited-lock risk of
        fork()ing a multithreaded parent mid-training (jax dispatch/tunnel
        threads may hold malloc/gRPC mutexes at fork time); call ``close()``
        (or drop the loader) when done."""
        assert workers_mode in ("thread", "process")
        if workers_mode == "process" and not hasattr(dataset, "fetch"):
            # without an explicit-visit fetch, forked workers would fall back
            # to per-worker __getitem__ counters that reset on every fork and
            # repeat the augmentation stream — fail fast instead of silently
            # losing the parent-assigned-visit determinism guarantee
            raise TypeError(
                "workers_mode='process' requires the dataset to expose "
                "fetch(index, visit) (see NOCSDataset.fetch)")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.workers_mode = workers_mode
        self.drop_last = drop_last
        self.base_indices = (
            np.asarray(indices) if indices is not None
            else np.arange(len(dataset))
        )
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)
        # per-index visit counters, assigned in the PARENT at dispatch time
        # (persist across epochs) — see the module-level _fetch note
        self._visits: Dict[int, int] = {}
        self._pool: Optional[ProcessPoolExecutor] = None

    def _ensure_pool(self) -> ProcessPoolExecutor:
        if self._pool is None:
            ctx = multiprocessing.get_context("fork")
            # For fork contexts, ProcessPoolExecutor launches ALL
            # max_workers synchronously inside the FIRST submit
            # (_start_executor_manager_thread -> _launch_processes on
            # CPython >= 3.11; dynamic per-submit spawning is spawn-only).
            # One warm-up submit therefore pins every fork to HERE — the
            # consumer thread, now — instead of the producer thread at the
            # first dispatch, which is the controlled-fork-site property the
            # class docstring relies on.
            pool = ProcessPoolExecutor(
                max_workers=self.num_workers, mp_context=ctx,
                initializer=_init_worker, initargs=(self.dataset,))
            pool.submit(int, 0).result(timeout=120)
            self._pool = pool
        return self._pool

    def close(self) -> None:
        """Shut down the persistent process pool (no-op in thread mode)."""
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001 - interpreter teardown
            pass

    def __len__(self):
        n = len(self.base_indices)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> List[np.ndarray]:
        idx = self.base_indices.copy()
        if self.shuffle:
            self.rng.shuffle(idx)
        nb = len(self)
        return [idx[i * self.batch_size:(i + 1) * self.batch_size]
                for i in range(nb)]

    def _assign_visits(self, batches: List[np.ndarray]) -> List[np.ndarray]:
        """Visit numbers per dispatched index, assigned in the parent in
        dispatch order: counters persist across epochs and across duplicate
        indices within an epoch (the CAMERA:Real resampling repeats Real
        indices), so every fetch draws a FRESH augmentation stream in both
        worker modes."""
        out = []
        for batch_idx in batches:
            v = np.empty(len(batch_idx), np.int64)
            for j, ix in enumerate(batch_idx):
                n = self._visits.get(int(ix), 0) + 1
                self._visits[int(ix)] = n
                v[j] = n
            out.append(v)
        return out

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._batches()
        visits = self._assign_visits(batches)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()
        # the persistent fork pool is created here — consumer thread, not the
        # producer — and reused across epochs (see __init__ docstring)
        proc_pool = (self._ensure_pool()
                     if self.workers_mode == "process" else None)
        ds_fetch = getattr(self.dataset, "fetch", None)

        def producer():
            # The sentinel (or the worker exception, which the consumer
            # re-raises) is ALWAYS enqueued — a dataset error must surface
            # in the training loop, not leave the consumer blocked on
            # q.get() forever (torch DataLoader propagates worker errors
            # the same way).
            err = None
            try:
                if proc_pool is not None:
                    pool_cm, pool = None, proc_pool
                    fetch = _fetch
                else:
                    pool_cm = ThreadPoolExecutor(max_workers=self.num_workers)
                    pool = pool_cm
                    fetch = ds_fetch or (
                        lambda index, visit: self.dataset[int(index)])
                try:
                    for batch_idx, batch_visits in zip(batches, visits):
                        if stop.is_set():
                            break
                        item = collate(
                            list(pool.map(fetch, batch_idx, batch_visits)))
                        # bounded put with a timeout so an abandoned iterator
                        # (consumer stopped reading) can't block this thread
                        # forever on a full queue
                        while not stop.is_set():
                            try:
                                q.put(item, timeout=0.5)
                                break
                            except queue.Full:
                                continue
                finally:
                    if pool_cm is not None:  # thread pool is per-epoch
                        pool_cm.shutdown(wait=True)
            except BaseException as e:  # noqa: BLE001 - forwarded to consumer
                err = e
                if proc_pool is not None:
                    # a worker error may leave the persistent pool broken
                    # (BrokenProcessPool); drop it so the next epoch forks a
                    # fresh one instead of reusing a dead pool
                    self.close()
            while True:
                try:
                    q.put(err if err is not None else sentinel, timeout=0.5)
                    break
                except queue.Full:
                    if stop.is_set():
                        break
                    continue

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # reached on exhaustion AND on GeneratorExit (caller broke out of
            # the loop or dropped the iterator) — release the producer, its
            # thread pool, and the prefetched batches
            stop.set()
            while True:
                try:
                    if q.get_nowait() is sentinel:
                        break
                except queue.Empty:
                    if not t.is_alive():
                        break
                    t.join(timeout=0.1)
            t.join()


def get_data_loaders_from_cfg(cfg, data_type=("train", "val", "test")):
    """Build loaders per split (ref ``datasets_genpose.py:587-640``)."""
    from genpose_tpu.data.nocs import NOCSDataset

    loaders = {}
    rng = np.random.default_rng(cfg.seed)

    def build(source, mode, batch_size, percentage):
        ds = NOCSDataset(
            data_dir=cfg.data_path, source=source, mode=mode,
            n_pts=cfg.num_points, img_size=cfg.img_size, per_obj=cfg.per_obj,
            dzi_params=cfg.dzi, deform_2d_params=cfg.deform_2d, seed=cfg.seed,
        )
        indices = None
        if source == "CAMERA+Real" and mode == "train":
            indices = camera_real_indices(ds.subset_len, percentage, rng)
        elif percentage < 1.0:
            size = int(percentage * len(ds))
            indices = rng.permutation(len(ds))[:size]
        # Train batches must be shape-stable: a ragged final batch both
        # forces an XLA recompile of the train step and cannot be sharded
        # over a dp mesh (axis 0 not divisible by the device count).  The
        # reference's drop_last=False (``datasets_genpose.py:564``) is safe
        # only because it is single-GPU eager torch.  Kept ragged when the
        # dataset is smaller than one batch (tiny smoke runs).
        n_idx = len(indices) if indices is not None else len(ds)
        drop_last = mode == "train" and n_idx >= batch_size
        return DataLoader(
            ds, batch_size=batch_size, shuffle=(mode == "train"),
            num_workers=cfg.num_workers if mode == "train" else 1,
            drop_last=drop_last, indices=indices, seed=cfg.seed,
            workers_mode=getattr(cfg, "loader_mode", "thread"),
        )

    if "train" in data_type:
        loaders["train_loader"] = build(
            cfg.train_source, "train", cfg.batch_size, cfg.percentage_data_for_train)
    if "val" in data_type:
        loaders["val_loader"] = build(
            cfg.val_source, "test", cfg.mini_bs, cfg.percentage_data_for_val)
    if "test" in data_type:
        loaders["test_loader"] = build(
            cfg.test_source, "test", cfg.mini_bs, cfg.percentage_data_for_test)
    return loaders
