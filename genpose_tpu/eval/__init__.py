"""Metrics and evaluation drivers (reference L6/L7)."""

from genpose_tpu.eval.metrics import (  # noqa: F401
    compute_RT_errors,
    compute_RT_overlaps,
    get_metrics,
    pose_errors_jax,
    symmetry_flags,
)
