"""Flax models: point-cloud encoders, score / energy networks, multiplexer."""

from genpose_tpu.models.pointnet2 import Pointnet2ClsMSG, CLS_MSG_CONFIGS  # noqa: F401
from genpose_tpu.models.pointnet import PointNetfeat  # noqa: F401
from genpose_tpu.models.scorenet import PoseScoreNet  # noqa: F401
from genpose_tpu.models.energynet import PoseEnergyNet  # noqa: F401
from genpose_tpu.models.posenet import GFObjectPose  # noqa: F401
