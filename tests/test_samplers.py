"""Sampler correctness vs closed-form Gaussian targets.

With an analytic score for a Gaussian data distribution N(0, s^2 I), the
PF-ODE / PC samplers must produce samples from ~N(0, s^2 + sigma_eps^2)
and the likelihood must match the analytic log-density.
"""

import jax
import jax.numpy as jnp
import numpy as np

from genpose_tpu.diffusion import init_sde
from genpose_tpu.diffusion.samplers import (
    edm_sampler,
    ode_likelihood,
    ode_sampler,
    pc_sampler,
)

S_DATA = 0.7  # data std
POSE_MODE = "euler_xyz"  # 6-dim pose; rotation block is untouched by renorm


def gaussian_score(sde):
    def score_fn(x, t):
        _, std = sde.marginal_prob(None, t)
        std = jnp.reshape(std, (-1, 1)) if jnp.ndim(std) > 0 else std
        return -x / (S_DATA**2 + std**2)

    return score_fn


def test_ode_sampler_gaussian():
    sde = init_sde("ve")
    _, x = ode_sampler(
        gaussian_score(sde),
        jax.random.PRNGKey(0),
        batch_size=4000,
        sde=sde,
        pose_mode=POSE_MODE,
        num_steps=300,
        integrator="heun",
    )
    x = np.asarray(x)
    assert x.shape == (4000, 6)
    assert abs(x.mean()) < 0.05
    assert abs(x.std() - S_DATA) / S_DATA < 0.05


def test_ode_sampler_euler_vs_heun():
    """Euler at many steps should agree with Heun (both converged)."""
    sde = init_sde("ve")
    kwargs = dict(batch_size=500, sde=sde, pose_mode=POSE_MODE)
    _, xh = ode_sampler(gaussian_score(sde), jax.random.PRNGKey(1),
                        num_steps=400, integrator="heun", **kwargs)
    _, xe = ode_sampler(gaussian_score(sde), jax.random.PRNGKey(1),
                        num_steps=1500, integrator="euler", **kwargs)
    assert float(jnp.mean(jnp.abs(xh - xe))) < 0.02


def test_ode_sampler_init_x_t0():
    """Tracking path: init_x + small T0 stays near the init pose
    (ref evaluation_tracking.py:302-317, samplers.py:180)."""
    sde = init_sde("ve")
    init = jnp.tile(jnp.asarray([[0.3, -0.2, 0.5, 0.1, 0.0, -0.4]]), (256, 1))
    _, x = ode_sampler(
        gaussian_score(sde), jax.random.PRNGKey(2), batch_size=256, sde=sde,
        pose_mode=POSE_MODE, num_steps=100, T0=0.15, init_x=init,
    )
    # sigma(0.15) ~ 0.036: samples should stay within a few sigma of init
    # after denoising toward the data distribution
    assert x.shape == (256, 6)
    assert float(jnp.mean(jnp.linalg.norm(x - init, axis=-1))) < 0.5


def test_ode_sampler_pts_center_added():
    sde = init_sde("ve")
    center = jnp.ones((64, 3)) * 5.0
    _, x0 = ode_sampler(gaussian_score(sde), jax.random.PRNGKey(3), 64, sde,
                        POSE_MODE, num_steps=50)
    _, xc = ode_sampler(gaussian_score(sde), jax.random.PRNGKey(3), 64, sde,
                        POSE_MODE, num_steps=50, pts_center=center)
    np.testing.assert_allclose(np.asarray(xc[:, -3:] - x0[:, -3:]),
                               np.full((64, 3), 5.0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(xc[:, :-3]), np.asarray(x0[:, :-3]),
                               atol=1e-6)


def test_ode_sampler_trajectory():
    sde = init_sde("ve")
    xs, x = ode_sampler(gaussian_score(sde), jax.random.PRNGKey(4), 8, sde,
                        POSE_MODE, num_steps=20, return_process=True)
    assert xs.shape == (8, 20, 6)


def test_pc_sampler_gaussian():
    sde = init_sde("ve")
    _, x = pc_sampler(
        gaussian_score(sde), jax.random.PRNGKey(5), batch_size=4000, sde=sde,
        pose_mode=POSE_MODE, num_steps=300,
    )
    x = np.asarray(x)
    assert abs(x.mean()) < 0.06
    assert abs(x.std() - S_DATA) / S_DATA < 0.03


def test_ode_likelihood_gaussian():
    sde = init_sde("ve")
    key = jax.random.PRNGKey(6)
    x = jax.random.normal(key, (512, 6)) * S_DATA
    _, ll_bits = ode_likelihood(gaussian_score(sde), jax.random.PRNGKey(7), x,
                                sde, POSE_MODE, num_steps=300)
    var = S_DATA**2 + 0.01**2
    analytic = (
        -0.5 * 6 * np.log(2 * np.pi * var)
        - np.sum(np.asarray(x) ** 2, -1) / (2 * var)
    ) / np.log(2)
    err = np.abs(np.asarray(ll_bits) - analytic)
    assert np.median(err) < 0.02  # bits; exact divergence + Heun integration


def test_edm_sampler_smoke():
    def denoise_fn(x, t):
        # perfect denoiser for N(0, s^2): E[x0|x_t] = x * s^2/(s^2+t^2)
        return x * (S_DATA**2 / (S_DATA**2 + t**2))

    _, x = edm_sampler(denoise_fn, jax.random.PRNGKey(8), batch_size=2000,
                       pose_mode=POSE_MODE, num_steps=32)
    x = np.asarray(x)
    assert abs(x.std() - S_DATA) / S_DATA < 0.1
