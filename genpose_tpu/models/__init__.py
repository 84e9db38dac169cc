"""Flax models: point-cloud encoders, score / energy networks, multiplexer."""

from genpose_tpu.models.pointnet2 import (  # noqa: F401
    CLS_MSG_CONFIGS,
    MSG_CFG,
    Pointnet2ClsMSG,
    Pointnet2MSG,
)
from genpose_tpu.models.pointnet import PointNetfeat  # noqa: F401
from genpose_tpu.models.scorenet import PoseDecoderNet, PoseScoreNet  # noqa: F401
from genpose_tpu.models.energynet import PoseEnergyNet  # noqa: F401
from genpose_tpu.models.posenet import GFObjectPose  # noqa: F401
