"""Shared utilities: logging, clocks, checkpoint helpers."""

from genpose_tpu.utils.logging import MetricsLogger, TrainClock  # noqa: F401
