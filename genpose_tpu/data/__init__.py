"""Data pipeline: NOCS ingestion (host) + batched JAX augmentation (device)."""

from genpose_tpu.data.augment import data_augment  # noqa: F401
from genpose_tpu.data.process import process_batch  # noqa: F401
