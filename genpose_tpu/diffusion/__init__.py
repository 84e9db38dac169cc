"""Score-based generative framework core (reference ``networks/gf_algorithms/``)."""

from genpose_tpu.diffusion.sde import SDE, init_sde  # noqa: F401
from genpose_tpu.diffusion.losses import dsm_loss, dsm_loss_repeated  # noqa: F401
