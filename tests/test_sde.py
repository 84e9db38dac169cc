"""SDE schedule and DSM loss tests (property tests vs closed-form Gaussians)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genpose_tpu.diffusion import init_sde
from genpose_tpu.diffusion.losses import dsm_loss, dsm_loss_repeated


def test_ve_schedule_values():
    """VE defaults: sigma in [0.01, 50], eps 1e-5, T=1 (ref sde.py:90-97)."""
    sde = init_sde("ve")
    assert sde.eps == 1e-5 and sde.T == 1.0
    _, s0 = sde.marginal_prob(None, jnp.asarray(0.0))
    _, s1 = sde.marginal_prob(None, jnp.asarray(1.0))
    assert np.isclose(float(s0), 0.01)
    assert np.isclose(float(s1), 50.0)
    # geometric interpolation
    _, sh = sde.marginal_prob(None, jnp.asarray(0.5))
    assert np.isclose(float(sh), np.sqrt(0.01 * 50.0))
    # diffusion coeff: g(t)^2 = 2 sigma(t)^2 log(smax/smin)
    _, g = sde.sde(jnp.asarray(0.5))
    assert np.isclose(float(g) ** 2, 2 * float(sh) ** 2 * np.log(50 / 0.01), rtol=1e-5)


def test_ve_prior_std():
    sde = init_sde("ve")
    x = sde.prior(jax.random.PRNGKey(0), (20000, 4), T=1.0)
    assert abs(float(jnp.std(x)) - 50.0) / 50.0 < 0.02


def test_vp_schedule():
    sde = init_sde("vp")
    mean, std = sde.marginal_prob(jnp.ones((1, 3)), jnp.asarray(1.0))
    # at T=1, VP is nearly pure noise
    assert float(std) > 0.99
    assert abs(float(mean[0, 0])) < 0.01
    mean0, std0 = sde.marginal_prob(jnp.ones((1, 3)), jnp.asarray(1e-4))
    assert float(std0) < 0.01 and abs(float(mean0[0, 0]) - 1.0) < 1e-3


def test_subvp_and_edm_exist():
    subvp = init_sde("subvp")
    _, std = subvp.marginal_prob(jnp.ones((1, 3)), jnp.asarray(1.0))
    assert 0.9 < float(std) <= 1.0
    edm = init_sde("edm")
    _, std = edm.marginal_prob(None, jnp.asarray(7.0))
    assert float(std) == 7.0
    with pytest.raises(NotImplementedError):
        init_sde("bogus")


def test_dsm_loss_zero_for_analytic_score():
    """For a point-mass data distribution the DSM target equals the true
    posterior score; plugging it in gives (near) zero loss."""
    sde = init_sde("ve")
    key = jax.random.PRNGKey(1)
    gt = jax.random.normal(key, (64, 9))

    def perfect_score(x, t):
        _, std = sde.marginal_prob(None, t)
        return -(x - gt) / std**2

    loss = dsm_loss(perfect_score, jax.random.PRNGKey(2), gt, sde)
    assert float(loss) < 1e-8


def test_dsm_loss_scale_for_zero_score():
    """With score=0 the expected loss is E[std^2 * ||z/std||^2] = pose_dim."""
    sde = init_sde("ve")
    gt = jnp.zeros((4096, 9))
    zero_score = lambda x, t: jnp.zeros_like(x)
    loss = float(dsm_loss(zero_score, jax.random.PRNGKey(3), gt, sde))
    assert abs(loss - 9.0) / 9.0 < 0.1


def test_dsm_loss_repeated_reduces_variance():
    sde = init_sde("ve")
    gt = jnp.zeros((16, 9))
    zero_score = lambda x, t: jnp.zeros_like(x)
    singles = [
        float(dsm_loss(zero_score, jax.random.PRNGKey(i), gt, sde)) for i in range(8)
    ]
    reps = [
        float(dsm_loss_repeated(zero_score, jax.random.PRNGKey(i), gt, sde, 20))
        for i in range(8)
    ]
    assert np.var(reps) < np.var(singles)
