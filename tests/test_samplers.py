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


# ---------------------------------------------------------------------------
# adaptive RK45 (reference integrates adaptively: samplers.py:205 — t_eval
# only subsamples; scripts/eval_single.sh sets no --sampling_steps)
# ---------------------------------------------------------------------------

def _perturbed_score_net(bs, seed=7, scale=0.05):
    """A real (random) PoseScoreNet closure — adversarially rough dynamics."""
    from genpose_tpu.models.scorenet import PoseScoreNet

    sde = init_sde("ve")
    net = PoseScoreNet(marginal_prob_fn=sde.marginal_prob)
    key = jax.random.PRNGKey(0)
    pts_feat = jax.random.normal(key, (bs, 1024)) * 0.5
    v = net.init(key, pts_feat, jnp.zeros((bs, 9)), jnp.full((bs, 1), 0.5))
    leaves, treedef = jax.tree_util.tree_flatten(v["params"])
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    leaves = [l + scale * jax.random.normal(k, l.shape)
              for l, k in zip(leaves, keys)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    def score_fn(x, t):
        tb = jnp.broadcast_to(t, (x.shape[0], 1))
        return net.apply({"params": params}, pts_feat, x, tb)

    return sde, score_fn


def test_adaptive_rk45_matches_scipy():
    """ode_sampler_adaptive == scipy solve_ivp RK45 at atol/rtol 1e-5 on a
    perturbed score net, at the released T0 settings (0.55 eval, 0.15
    tracking).  This certifies the integrator against the reference's exact
    solver (``samplers.py:205``)."""
    from scipy import integrate

    from genpose_tpu.diffusion.samplers import ode_sampler_adaptive
    from genpose_tpu.ops.pose import normalize_rotation

    bs = 6
    sde, score_fn = _perturbed_score_net(bs)

    for T0 in (0.15, 0.55):
        k = jax.random.PRNGKey(3)
        x0 = np.asarray(sde.prior(k, (bs, 9), T=T0))

        def f(t, y):
            x = jnp.asarray(y.reshape(bs, 9), jnp.float32)
            drift, diff = sde.sde(jnp.asarray(t))
            s = score_fn(x, jnp.full((1, 1), t, jnp.float32))
            dx = float(drift) - 0.5 * float(diff) ** 2 * s
            return np.asarray(dx).reshape(-1).astype(np.float64)

        res = integrate.solve_ivp(f, (T0, sde.eps), x0.reshape(-1),
                                  rtol=1e-5, atol=1e-5, method="RK45")
        x_scipy = res.y[:, -1].reshape(bs, 9).astype(np.float32)
        x_scipy = np.concatenate(
            [np.asarray(normalize_rotation(jnp.asarray(x_scipy[:, :-3]),
                                           "rot_matrix")), x_scipy[:, -3:]],
            axis=-1)

        _, x_mine, stats = ode_sampler_adaptive(
            score_fn, k, bs, sde, T0=T0, denoise=False, return_stats=True)
        assert bool(stats["converged"])
        # same controller, same tolerances: agreement far inside 1e-5*scale
        np.testing.assert_allclose(np.asarray(x_mine), x_scipy, atol=1e-4)


def test_adaptive_rk45_gaussian_closed_form():
    """Analytic Gaussian point-mass score from T0=1.0 (VE sigma spans
    [0.01, 50]): x(eps) = mu + (x0-mu) * sigma(eps)/sigma(T).  Both the
    adaptive sampler and Heun-500 must hit the closed form; this pins the
    integrator budget in the well-posed regime."""
    from genpose_tpu.diffusion.samplers import ode_sampler_adaptive

    sde = init_sde("ve")
    mu = jnp.asarray([0.3, -0.2, 0.5, 0.1, -0.4, 0.25])

    def score_fn(x, t):
        _, std = sde.marginal_prob(None, t)
        return -(x - mu[None, :]) / (std ** 2 + 1e-12)

    bs = 64
    k = jax.random.PRNGKey(11)
    x0 = sde.prior(k, (bs, 6), T=1.0)
    _, s_eps = sde.marginal_prob(None, jnp.asarray(sde.eps))
    _, s_T = sde.marginal_prob(None, jnp.asarray(1.0))
    closed = np.asarray(mu[None, :] + (x0 - mu[None, :]) * (s_eps / s_T))

    _, x_ad, stats = ode_sampler_adaptive(
        score_fn, k, bs, sde, pose_mode=POSE_MODE, denoise=False,
        return_stats=True)
    assert bool(stats["converged"])
    np.testing.assert_allclose(np.asarray(x_ad), closed, atol=2e-4)

    _, x_heun = ode_sampler(score_fn, k, bs, sde, pose_mode=POSE_MODE,
                            num_steps=500, integrator="heun", denoise=False)
    np.testing.assert_allclose(np.asarray(x_heun), closed, atol=2e-3)


def test_heun500_vs_adaptive_documented_gap():
    """Measured decision record (VERDICT round-1 item 3): on an adversarial
    random score net the Heun-500 endpoint deviates from the adaptive RK45
    solution by up to ~2e-2 at T0=0.15 / ~3e-3 at T0=0.55 — fixed-step Heun
    is NOT automatically inside the reference tolerance.  The agent therefore
    exposes ``sampler='ode_adaptive'`` for exact protocol parity; Heun-500
    remains the fast default.  (Trained score fields are contractive, far
    tamer than this net — see the closed-form test above where Heun-500 is
    within 2e-3.)"""
    from genpose_tpu.diffusion.samplers import ode_sampler_adaptive

    bs = 6
    sde, score_fn = _perturbed_score_net(bs)
    gaps = {}
    for T0 in (0.15, 0.55):
        k = jax.random.PRNGKey(3)
        _, x_ad = ode_sampler_adaptive(score_fn, k, bs, sde, T0=T0,
                                       denoise=False)
        _, x_heun = ode_sampler(score_fn, k, bs, sde, num_steps=500, T0=T0,
                                denoise=False)
        gaps[T0] = float(jnp.max(jnp.abs(x_ad - x_heun)))
    # pin the measured magnitudes (regression guard, not a parity claim)
    assert gaps[0.15] < 5e-2 and gaps[0.55] < 1e-2, gaps


def test_agent_sample_ode_adaptive():
    """The agent dispatches sampler='ode_adaptive' inside one jit."""
    from genpose_tpu.config import Config
    from genpose_tpu.training.agent import PoseAgent

    cfg = Config(num_points=64, repeat_num=2, batch_size=4)
    agent = PoseAgent(cfg, "score", steps_per_epoch=4)
    key = jax.random.PRNGKey(0)
    batch = {
        "zero_mean_pts": jax.random.normal(key, (4, 64, 3)) * 0.1,
        "pts_center": jnp.zeros((4, 3)),
    }
    pred = agent.sample(batch, jax.random.PRNGKey(1), repeat_num=2,
                        sampler="ode_adaptive", T0=0.55)
    assert pred.shape == (4, 2, 9)
    assert np.all(np.isfinite(np.asarray(pred)))


def test_vp_pf_ode_is_stationary_for_standard_normal():
    """For VP with data ~ N(0, I) the analytic score is -x and the PF-ODE
    dx/dt = c(t)x - 0.5 g^2 (-x) = (-0.5b + 0.5b) x = 0 is exactly
    stationary.  This pins the drift term's x-contraction (review
    regression: the coefficient was ADDED as a constant, like the
    reference's ``samplers.py:198``, which diverges here)."""
    sde = init_sde("vp")
    score_fn = lambda x, t: -x
    key = jax.random.PRNGKey(3)
    bs = 16
    # euler_xyz: 6 dims, identity rotation-normalization, so the sampler
    # output IS the integrated state
    _, x = ode_sampler(score_fn, key, bs, sde, pose_mode="euler_xyz",
                       num_steps=200, denoise=False,
                       pts_center=jnp.zeros((bs, 3)))
    x0 = sde.prior(key, (bs, 6))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=5e-3)


def test_denoise_step_is_exact_vp_subvp():
    """The final reverse-diffusion denoise step must apply
    ``x += (g^2 * score - drift_coeff * x) * dt`` — with the x-contraction —
    in BOTH integrators (regression: the adaptive sampler dropped the ``*x``,
    a no-op for VE where the coefficient is 0 but a ~5e-5 constant bias per
    component for vp/subvp).  Isolate the step exactly by running the same
    key with denoise=False and applying the analytic update host-side;
    integration error cancels, so atol can sit far below the bug's bias."""
    from genpose_tpu.diffusion.samplers import ode_sampler_adaptive

    for mode in ("vp", "subvp"):
        sde = init_sde(mode)
        score_fn = lambda x, t: -x  # analytic score of N(0, I) data
        key = jax.random.PRNGKey(7)
        bs, eps = 8, sde.eps
        drift_c, diffusion = sde.sde(jnp.asarray(eps))
        common = dict(batch_size=bs, sde=sde, pose_mode="euler_xyz",
                      pts_center=jnp.zeros((bs, 3)))

        # adaptive: denoise dt = (1 - eps)/1000
        _, x_pre = ode_sampler_adaptive(score_fn, key, denoise=False, **common)
        _, x_den = ode_sampler_adaptive(score_fn, key, denoise=True, **common)
        want = x_pre + (diffusion**2 * (-x_pre) - drift_c * x_pre) * (
            (1.0 - eps) / 1000.0)
        np.testing.assert_allclose(np.asarray(x_den), np.asarray(want),
                                   atol=1e-7, err_msg=f"adaptive/{mode}")

        # fixed-step: denoise dt = (1 - eps)/num_steps
        _, x_pre = ode_sampler(score_fn, key, num_steps=50, denoise=False,
                               **common)
        _, x_den = ode_sampler(score_fn, key, num_steps=50, denoise=True,
                               **common)
        want = x_pre + (diffusion**2 * (-x_pre) - drift_c * x_pre) * (
            (1.0 - eps) / 50)
        np.testing.assert_allclose(np.asarray(x_den), np.asarray(want),
                                   atol=1e-7, err_msg=f"fixed/{mode}")


def test_vp_likelihood_of_standard_normal():
    """Same setting: delta_logp integrates to ~0, so the log-likelihood must
    equal the standard-normal logpdf (in bits).  Pins both the drift term
    and the pose_dim * drift_coeff divergence of the review fix."""
    from genpose_tpu.diffusion.samplers import ode_likelihood

    sde = init_sde("vp")
    score_fn = lambda x, t: -x
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 9))
    _, ll_bits = ode_likelihood(score_fn, jax.random.PRNGKey(6), x, sde,
                                num_steps=400)
    d = x.shape[1]
    want = (-d / 2.0 * np.log(2 * np.pi)
            - np.sum(np.asarray(x) ** 2, axis=-1) / 2.0) / np.log(2.0)
    np.testing.assert_allclose(np.asarray(ll_bits), want, rtol=0.02)


def test_vp_subvp_agent_smoke():
    """sde_mode='vp'/'subvp' must construct, train a step, and sample
    (review regression: marginal_prob(None, t) crashed in both modes)."""
    from genpose_tpu.config import Config
    from genpose_tpu.training.agent import PoseAgent

    for mode in ("vp", "subvp"):
        cfg = Config(num_points=32, repeat_num=2, batch_size=4,
                     sampling_steps=4, sde_mode=mode)
        agent = PoseAgent(cfg, "score", steps_per_epoch=4)
        key = jax.random.PRNGKey(0)
        batch = {
            "zero_mean_pts": jax.random.normal(key, (4, 32, 3)) * 0.1,
            "zero_mean_gt_pose": jax.random.normal(key, (4, 9)),
            "pts_center": jnp.zeros((4, 3)),
        }
        losses = agent.train_step(batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(losses["gf"])), mode
        pred = agent.sample(batch, jax.random.PRNGKey(2), repeat_num=2,
                            sampler="ode", num_steps=4)
        assert np.all(np.isfinite(np.asarray(pred))), mode


def test_pc_sampler_T0_tracking_prior():
    """T0 extension (documented in the docstring): with T0 + init_x the PC
    ladder starts at T0 with prior noise at sigma(T0) added — the tracking
    semantics ode_sampler has — instead of silently running the full ladder
    from T=1 (sigma 50) that would obliterate the prior.

    snr=0 disables the Langevin corrector (which, with an ANALYTIC
    equilibrium score, re-samples the data distribution at any t and would
    forget the prior by design) so the assertion isolates the ladder-start
    mechanics: predictor noise is diffusion(t)-scaled, tiny from t=0.15,
    catastrophic from t=1."""
    sde = init_sde("ve")
    init = jnp.tile(jnp.asarray([[1., 0, 0, 0, 1., 0, 0.1, 0.2, 0.3]]),
                    (256, 1))
    score = gaussian_score(sde)
    _, x_tracked = pc_sampler(
        score, jax.random.PRNGKey(11), batch_size=256, sde=sde,
        pose_mode="rot_matrix", num_steps=60, snr=0.0, T0=0.15, init_x=init,
    )
    _, x_full = pc_sampler(
        score, jax.random.PRNGKey(11), batch_size=256, sde=sde,
        pose_mode="rot_matrix", num_steps=60, snr=0.0, init_x=init,
    )
    d_tracked = float(jnp.linalg.norm(x_tracked[:, -3:] - init[:, -3:],
                                      axis=-1).mean())
    d_full = float(jnp.linalg.norm(x_full[:, -3:] - init[:, -3:],
                                   axis=-1).mean())
    assert np.isfinite(d_tracked) and d_tracked < 0.2
    # the full ladder (reference behavior, kept when T0 is None) forgets
    # the prior entirely
    assert d_full > 3 * d_tracked
