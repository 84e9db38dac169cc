"""Device-mesh parallelism utilities (TPU-native replacement for the
reference's dead gloo/DataParallel code, ``utils/misc.py:14-27``,
``posenet_agent.py:86-89``)."""

from genpose_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
)
