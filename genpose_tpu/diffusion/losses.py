"""Denoising score-matching losses (reference ``networks/gf_algorithms/losses.py``).

Functional JAX redesign:

- the model is passed as a plain callable ``score_fn(pose, t) -> score`` that
  closes over params and the (batch-shared) point-cloud feature;
- the reference's ``repeat_num`` Python loop (``posenet_agent.py:185-195``,
  x20 re-evaluations of the small MLP on cached features) becomes a single
  vmapped evaluation over a ``[repeat, bs]`` noise axis — one fused kernel
  instead of 20 sequential graph launches.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from genpose_tpu.diffusion.sde import SDE


def dsm_loss(
    score_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    key: jax.Array,
    gt_pose: jnp.ndarray,
    sde: SDE,
    teacher_score_fn: Callable | None = None,
) -> jnp.ndarray:
    """Single-draw denoising score matching (reference ``losses.py:47-89``).

    gt_pose: [bs, pose_dim] zero-centered GT pose.
    t ~ U(eps, 1); x = mu + z*std; target = -z/std; weight std^2.
    Returns a scalar: mean over batch of the summed weighted square error.
    """
    bs, pose_dim = gt_pose.shape
    k_t, k_z = jax.random.split(key)
    random_t = jax.random.uniform(k_t, (bs, 1), minval=sde.eps, maxval=1.0)
    mu, std = sde.marginal_prob(gt_pose, random_t)
    std = jnp.reshape(std, (bs, 1))
    z = jax.random.normal(k_z, (bs, pose_dim))
    perturbed_x = mu + z * std

    estimated_score = score_fn(perturbed_x, random_t)

    if teacher_score_fn is None:
        target_score = -z / std  # = -z*std / std**2
    else:
        target_score = teacher_score_fn(perturbed_x, random_t)

    loss_weighting = std**2
    return jnp.mean(
        jnp.sum(loss_weighting * (estimated_score - target_score) ** 2, axis=-1)
    )


def dsm_loss_repeated(
    score_fn, key, gt_pose, sde, repeat_num: int, teacher_score_fn=None
) -> jnp.ndarray:
    """Average of ``repeat_num`` independent DSM draws, fully vectorized.

    Equivalent in expectation (and in per-draw distribution) to the
    reference's sequential x``repeat_num`` loop (``posenet_agent.py:176-197``),
    but evaluated as one batched model call.
    """
    keys = jax.random.split(key, repeat_num)
    losses = jax.vmap(
        lambda k: dsm_loss(score_fn, k, gt_pose, sde, teacher_score_fn)
    )(keys)
    return jnp.mean(losses)


def edm_dsm_loss(
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    key: jax.Array,
    gt_pose: jnp.ndarray,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
) -> jnp.ndarray:
    """EDM-style loss (reference ``losses.py:8-44``, selected when
    ``sde_mode=='edm'``, ``posenet_agent.py:70-71``): sigma log-uniform in
    [sigma_min, sigma_max] (t and sigma are interchangeable in EDM),
    perturbed x = y + sigma*z, loss = ||(D(x, sigma) - y)/sigma||^2.

    ``denoise_fn(x, sigma) -> denoised pose`` (the decoder head's output,
    D = x + sigma*f).  Algebraically identical to the reference's
    ``(output*sigma + z)^2`` with its score-style output f/sigma, since
    (D - y)/sigma = f + z.
    """
    bs, pose_dim = gt_pose.shape
    k_t, k_z = jax.random.split(key)
    z = jax.random.normal(k_z, (bs, pose_dim))
    u = jax.random.uniform(k_t, (bs, 1))
    sigma_t = jnp.exp(
        jnp.log(sigma_min) + u * (jnp.log(sigma_max) - jnp.log(sigma_min))
    )
    perturbed_x = gt_pose + z * sigma_t
    denoised = denoise_fn(perturbed_x, sigma_t)
    return jnp.mean(jnp.sum(((denoised - gt_pose) / sigma_t) ** 2, axis=-1))


def edm_dsm_loss_repeated(
    denoise_fn, key, gt_pose, repeat_num: int,
    sigma_min: float = 0.002, sigma_max: float = 80.0,
) -> jnp.ndarray:
    """Average of ``repeat_num`` independent EDM-DSM draws, vectorized like
    :func:`dsm_loss_repeated` (the agent's ``repeat_num`` loop)."""
    keys = jax.random.split(key, repeat_num)
    losses = jax.vmap(
        lambda k: edm_dsm_loss(denoise_fn, k, gt_pose, sigma_min, sigma_max)
    )(keys)
    return jnp.mean(losses)
