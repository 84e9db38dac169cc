"""Observability: scalar logging (TensorBoard + JSONL) and the train clock.

Replaces the reference's tensorboardX plumbing spread through
``posenet_agent.py:553-598`` and the ``TrainClock``
(``utils/genpose_utils.py:70-96``).  Every scalar also lands in a JSONL file
so runs are greppable without TensorBoard.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


def setup_logger(logger_name: str, log_file: str, level=None):
    """File + stream logger (ref ``sgpa_utils.py:54-64``)."""
    import logging

    logger = logging.getLogger(logger_name)
    # logging.getLogger caches by name: drop previous handlers so a second
    # setup (resume, multiple runners in one process) doesn't double-write
    for h in list(logger.handlers):
        logger.removeHandler(h)
        h.close()
    formatter = logging.Formatter("%(asctime)s : %(message)s")
    fh = logging.FileHandler(log_file, mode="a")
    fh.setFormatter(formatter)
    logger.setLevel(level if level is not None else logging.INFO)
    logger.addHandler(fh)
    sh = logging.StreamHandler()
    sh.setFormatter(formatter)
    logger.addHandler(sh)
    return logger


class TrainClock:
    """Epoch/minibatch/step counter (ref ``genpose_utils.py:70-96``)."""

    def __init__(self):
        self.epoch = 1
        self.minibatch = 0
        self.step = 0

    def tick(self):
        self.minibatch += 1
        self.step += 1

    def tock(self):
        self.epoch += 1
        self.minibatch = 0

    def make_checkpoint(self):
        return {"epoch": self.epoch, "minibatch": self.minibatch, "step": self.step}

    def restore_checkpoint(self, clock_dict):
        self.epoch = clock_dict["epoch"]
        self.minibatch = clock_dict["minibatch"]
        self.step = clock_dict["step"]


class MetricsLogger:
    """Scalars to TensorBoard (if available) + always JSONL."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self.jsonl_path = os.path.join(log_dir, "metrics.jsonl")
        self._jsonl = open(self.jsonl_path, "a")
        self.writer = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(log_dir)
            except ImportError:
                pass

    def scalar(self, tag: str, value: float, step: int):
        if self.writer is not None:
            self.writer.add_scalar(tag, value, step)
        self._jsonl.write(
            json.dumps({"t": time.time(), "tag": tag, "value": float(value),
                        "step": int(step)}) + "\n"
        )
        # the jsonl exists to be tail/grep-able DURING a multi-day run, and
        # a crash must not eat the buffered tail; scalars are logged every
        # ~50 steps, so a flush per line is free
        self._jsonl.flush()

    def scalars(self, values: Dict[str, float], step: int, prefix: str = ""):
        for k, v in values.items():
            self.scalar(f"{prefix}{k}", float(v), step)

    def image(self, tag: str, img, step: int):
        if self.writer is not None:
            self.writer.add_image(tag, img, step)

    def flush(self):
        self._jsonl.flush()
        if self.writer is not None:
            self.writer.flush()

    def close(self):
        self.flush()
        self._jsonl.close()
        if self.writer is not None:
            self.writer.close()


def merge_results(results_ori: dict, results_new: dict) -> dict:
    """Concatenate per-batch inference result dicts
    (ref ``genpose_utils.py:99-110``)."""
    import numpy as np

    if not results_ori:
        return results_new
    return {
        k: np.concatenate([np.asarray(results_ori[k]),
                           np.asarray(results_new[k])], axis=0)
        for k in ("pred_pose", "gt_pose", "cls_id", "handle_visibility")
    }
