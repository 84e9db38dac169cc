"""Pose energy network (ref ``networks/gf_algorithms/energynet.py:32-222``).

Same trunk as the score net, but the head output f_theta is converted to a
scalar (or decoupled rot/trans) energy.  The score is the *gradient of the
energy w.r.t. the pose input* — in the reference done with
``torch.autograd.grad`` (``energynet.py:210-215``); here it is a plain
``jax.grad`` over the module's energy method (see ``posenet.py``), which is
cleaner AND differentiable to any order for free.

Modes (defaults from ``configs/config.py:40-42``):
- energy_mode: 'IP' (inner product <pose, s_theta>), also 'DAE', 'L2';
- s_theta_mode: 'score' (f/sigma), also 'decoder', 'identical';
- norm_energy: 'identical', also 'std', 'minus'.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn

from genpose_tpu.models.scorenet import PoseTrunk


class PoseEnergyNet(nn.Module):
    marginal_prob_fn: Callable
    pose_mode: str = "rot_matrix"
    regression_head: str = "Rx_Ry_and_T"
    energy_mode: str = "IP"
    s_theta_mode: str = "score"
    norm_energy: str = "identical"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.trunk = PoseTrunk(pose_mode=self.pose_mode,
                               regression_head=self.regression_head,
                               dtype=self.dtype, name="trunk")

    def precompute(self, pts_feat):
        return self.trunk.precompute(pts_feat)

    def __call__(self, pts_feat, sampled_pose, t, decoupled_rt: bool = True):
        """Returns the energy: [bs, 2] if decoupled IP, else [bs]."""
        return self.energy_from(self.precompute(pts_feat), sampled_pose, t,
                                decoupled_rt=decoupled_rt)

    def energy_from(self, projs, sampled_pose, t, decoupled_rt: bool = True):
        f_theta = self.trunk.f_theta_from(projs, sampled_pose, t)
        _, std = self.marginal_prob_fn(None, t)
        std = jnp.reshape(std, (-1, 1))

        # s_theta (ref energynet.py:165-173)
        if self.s_theta_mode == "score":
            s_theta = f_theta / std
        elif self.s_theta_mode == "decoder":
            s_theta = sampled_pose - std * f_theta
        elif self.s_theta_mode == "identical":
            s_theta = f_theta
        else:
            raise NotImplementedError(self.s_theta_mode)

        # energy (ref energynet.py:175-187)
        if self.energy_mode == "DAE":
            energy = -0.5 * jnp.sum((sampled_pose - s_theta) ** 2, axis=-1)
        elif self.energy_mode == "L2":
            energy = -0.5 * jnp.sum(s_theta**2, axis=-1)
        elif self.energy_mode == "IP":
            if decoupled_rt:
                e_rot = jnp.sum(sampled_pose[:, :-3] * s_theta[:, :-3], axis=-1)
                e_trans = jnp.sum(sampled_pose[:, -3:] * s_theta[:, -3:], axis=-1)
                energy = jnp.stack([e_rot, e_trans], axis=-1)
            else:
                energy = jnp.sum(sampled_pose * s_theta, axis=-1)
        else:
            raise NotImplementedError(self.energy_mode)

        # normalisation (ref energynet.py:189-197)
        if self.norm_energy == "identical":
            pass
        elif self.norm_energy == "std":
            denom = std + 1e-7
            energy = energy / (denom[:, 0] if energy.ndim == 1 else denom)
        elif self.norm_energy == "minus":
            energy = -energy
        else:
            raise NotImplementedError(self.norm_energy)
        return energy
