"""Training stack: functional TrainState, jitted agents, ranking losses."""

from genpose_tpu.training.ranking import (  # noqa: F401
    ranking_loss,
    sort_poses_by_energy,
    sort_results,
)
from genpose_tpu.training.state import EMA, TrainState, create_train_state  # noqa: F401
