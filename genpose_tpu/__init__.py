"""genpose_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for category-level
6D object pose estimation via score-based diffusion, with the capabilities of
the GenPose reference (NeurIPS 2023, arXiv:2306.10531).

Layer map (mirrors reference layers L0-L7, re-designed TPU-first):

- ``genpose_tpu.ops``       - pose math + point-cloud kernels (Pallas FPS /
                              ball-query, XLA gathers).  Replaces the
                              reference CUDA extension (L0/L1) and
                              ``utils/misc.py`` rotation utilities.
- ``genpose_tpu.models``    - PointNet / PointNet++ encoders, score & energy
                              networks, the ``GFObjectPose`` multiplexer
                              (reference L2-L4 ``networks/``).
- ``genpose_tpu.diffusion`` - SDE schedules, denoising score-matching losses,
                              fully on-device ``lax.scan`` samplers
                              (reference L3 ``networks/gf_algorithms/``).
- ``genpose_tpu.training``  - functional ``TrainState`` (params/EMA/optax),
                              jitted train/eval steps, ranking loss, trainer
                              CLI (reference ``networks/posenet_agent.py``,
                              ``runners/trainer.py``).
- ``genpose_tpu.data``      - NOCS dataset ingestion, DZI cropping,
                              depth->pointcloud, batched JAX augmentations
                              (reference L5 ``datasets/``, ``utils/data_augmentation.py``).
- ``genpose_tpu.eval``      - pose metrics, NOCS-style mAP, single-frame and
                              tracking evaluation drivers (reference L6/L7).
- ``genpose_tpu.parallel``  - device-mesh construction and sharding rules
                              (DP over batch, hypothesis axis sharding) for
                              pjit/shard_map.  Replaces the reference's dead
                              gloo/DataParallel code with ICI collectives.
"""

__version__ = "0.1.0"

from genpose_tpu.config import Config, get_config  # noqa: F401
