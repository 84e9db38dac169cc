"""SDE schedules (VE / VP / sub-VP / EDM) as pure-jnp function factories.

Re-design of the reference ``networks/gf_algorithms/sde.py:13-116`` with the
same hyperparameters: VE sigma in [0.01, 50], eps=1e-5, T=1.0 is the default
used by all released GenPose checkpoints (``sde.py:90-97``).

Everything is a jittable function of traced tensors; ``prior`` takes an
explicit PRNG key (JAX-functional replacement for ``torch.randn``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SDE:
    """Bundle of schedule functions for one SDE family.

    Attributes mirror the tuple returned by the reference ``init_sde``
    (``sde.py:80-116``): (prior_fn, marginal_prob_fn, sde_fn, eps, T).
    """

    mode: str
    prior: Callable[[jax.Array, Tuple[int, ...]], jnp.ndarray]  # (key, shape[, T]) -> x
    marginal_prob: Callable  # (x, t) -> (mean, std)
    sde: Callable  # (t) -> (drift_coeff, diffusion_coeff)
    eps: float
    T: float

    def __hash__(self):  # usable as a static jit argument
        return hash((self.mode, self.eps, self.T))

    def __eq__(self, other):
        return (
            isinstance(other, SDE)
            and (self.mode, self.eps, self.T) == (other.mode, other.eps, other.T)
        )


# ----- VE SDE (reference sde.py:15-28) -----

def ve_marginal_prob(x, t, sigma_min=0.01, sigma_max=50.0):
    std = sigma_min * (sigma_max / sigma_min) ** t
    return x, std


def ve_sde(t, sigma_min=0.01, sigma_max=50.0):
    sigma = sigma_min * (sigma_max / sigma_min) ** t
    drift = jnp.zeros_like(jnp.asarray(t, jnp.float32))
    diffusion = sigma * jnp.sqrt(2.0 * (jnp.log(sigma_max) - jnp.log(sigma_min)))
    return drift, diffusion


def ve_prior(key, shape, sigma_min=0.01, sigma_max=50.0, T=1.0):
    _, sigma_T = ve_marginal_prob(None, T, sigma_min, sigma_max)
    return jax.random.normal(key, shape) * sigma_T


# ----- VP SDE (reference sde.py:32-45) -----

def vp_marginal_prob(x, t, beta_0=0.1, beta_1=20.0):
    # x=None -> std-only query: every score/energy head calls
    # marginal_prob(None, t) for sigma(t) (the reference passes a dummy
    # tensor there, scorenet.py:205; None is the honest equivalent)
    log_mean_coeff = -0.25 * t**2 * (beta_1 - beta_0) - 0.5 * t * beta_0
    mean = None if x is None else jnp.exp(log_mean_coeff) * x
    std = jnp.sqrt(1.0 - jnp.exp(2.0 * log_mean_coeff))
    return mean, std


def vp_sde(t, beta_0=0.1, beta_1=20.0):
    beta_t = beta_0 + t * (beta_1 - beta_0)
    return -0.5 * beta_t, jnp.sqrt(beta_t)


def vp_prior(key, shape, beta_0=0.1, beta_1=20.0, T=1.0):
    return jax.random.normal(key, shape)


# ----- sub-VP SDE (reference sde.py:49-63) -----

def subvp_marginal_prob(x, t, beta_0=0.1, beta_1=20.0):
    log_mean_coeff = -0.25 * t**2 * (beta_1 - beta_0) - 0.5 * t * beta_0
    mean = None if x is None else jnp.exp(log_mean_coeff) * x
    std = 1.0 - jnp.exp(2.0 * log_mean_coeff)
    return mean, std


def subvp_sde(t, beta_0=0.1, beta_1=20.0):
    beta_t = beta_0 + t * (beta_1 - beta_0)
    discount = 1.0 - jnp.exp(-2.0 * beta_0 * t - (beta_1 - beta_0) * t**2)
    return -0.5 * beta_t, jnp.sqrt(beta_t * discount)


def subvp_prior(key, shape, beta_0=0.1, beta_1=20.0, T=1.0):
    return jax.random.normal(key, shape)


# ----- EDM SDE (reference sde.py:67-78) -----

def edm_marginal_prob(x, t, sigma_min=0.002, sigma_max=80.0):
    return x, t


def edm_sde(t, sigma_min=0.002, sigma_max=80.0):
    return jnp.zeros_like(jnp.asarray(t, jnp.float32)), jnp.sqrt(2.0 * t)


def edm_prior(key, shape, sigma_min=0.002, sigma_max=80.0, T=None):
    # EDM "time" IS sigma: a truncated start (T0/tracking pathway) draws
    # prior noise at the start sigma, not always at sigma_max
    sigma = sigma_max if T is None else T
    return jax.random.normal(key, shape) * sigma


def init_sde(sde_mode: str) -> SDE:
    """Build an :class:`SDE` with the reference hyperparameters (``sde.py:80-116``)."""
    import functools

    if sde_mode == "edm":
        sigma_min, sigma_max = 0.002, 80.0
        return SDE(
            mode="edm",
            prior=functools.partial(edm_prior, sigma_min=sigma_min, sigma_max=sigma_max),
            marginal_prob=functools.partial(edm_marginal_prob, sigma_min=sigma_min,
                                            sigma_max=sigma_max),
            sde=functools.partial(edm_sde, sigma_min=sigma_min, sigma_max=sigma_max),
            eps=0.002,
            T=sigma_max,
        )
    if sde_mode == "ve":
        sigma_min, sigma_max = 0.01, 50.0
        return SDE(
            mode="ve",
            prior=functools.partial(ve_prior, sigma_min=sigma_min, sigma_max=sigma_max),
            marginal_prob=functools.partial(ve_marginal_prob, sigma_min=sigma_min,
                                            sigma_max=sigma_max),
            sde=functools.partial(ve_sde, sigma_min=sigma_min, sigma_max=sigma_max),
            eps=1e-5,
            T=1.0,
        )
    if sde_mode == "vp":
        return SDE(
            mode="vp", prior=vp_prior, marginal_prob=vp_marginal_prob, sde=vp_sde,
            eps=1e-3, T=1.0,
        )
    if sde_mode == "subvp":
        return SDE(
            mode="subvp", prior=subvp_prior, marginal_prob=subvp_marginal_prob,
            sde=subvp_sde, eps=1e-3, T=1.0,
        )
    raise NotImplementedError(f"sde mode {sde_mode} is not supported")
