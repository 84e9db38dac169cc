"""Cross-implementation golden tests against the actual reference code.

The reference (`/root/reference`, GenPose, torch) is imported on CPU torch
via ``tests/_reference_bridge.py`` and compared NUMERICALLY to this
framework with ported weights:

- score-net forward parity for every regression head incl. the per-point
  RotHead/TransHead variant (``scorenet.py:85-222``) — certifies the concat
  order, the sigma(t) division, the GaussianFourier embedding, and the
  SplitTail/FusedTails/PerPointTail kernel repacking in one stroke;
- energy-net forward + autograd-score parity over all mode combos
  (``energynet.py:32-222``);
- ranking loss / sorting parity (``reward.py:63-155``);
- ``compute_mAP`` parity on identical synthetic scenes
  (``sgpa_utils.py:957-1197``), plus a test pinning the ONE deliberate
  deviation (the reference forgets to reorder pred_bboxes by score inside
  ``compute_2d_IoU_matches``, ``sgpa_utils.py:489-494``).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import _reference_bridge as rb
from _reference_bridge import import_reference

from genpose_tpu.diffusion.sde import init_sde
from genpose_tpu.utils.torch_port import port_trunk, port_gf_state_dict


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref():
    scorenet, energynet, sde_mod, reward, sgpa = import_reference(
        "networks.gf_algorithms.scorenet",
        "networks.gf_algorithms.energynet",
        "networks.gf_algorithms.sde",
        "networks.reward",
        "utils.sgpa_utils",
    )
    # the reference's mAP pooling path calls .cuda() unconditionally
    # (sgpa_utils.py:940); shim it on CPU and RESTORE at teardown so later
    # torch tests in the session are not order-dependent
    patch = rb.Patcher()
    patch(torch.Tensor, "cuda", lambda self, *a, **k: self)
    yield {
        "scorenet": scorenet,
        "energynet": energynet,
        "sde": sde_mod,
        "reward": reward,
        "sgpa": sgpa,
    }
    patch.restore()


def _randomize(net: torch.nn.Module, seed: int = 0) -> None:
    """Perturb every parameter AND BN running stats (the reference zero-inits
    tail output layers; XLA would constant-fold a zero head)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for m in net.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                                 generator=g) * 0.05)
                m.running_var.copy_(
                    1.0 + 0.1 * torch.rand(m.running_var.shape, generator=g))


def _ve_marginal(ref):
    _, marginal_prob_fn, _, _, _ = ref["sde"].init_sde("ve")
    return marginal_prob_fn


# ---------------------------------------------------------------------------
# score network forward parity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("regression_head,pose_mode", [
    ("RT", "rot_matrix"),
    ("R_and_T", "rot_matrix"),
    ("Rx_Ry_and_T", "rot_matrix"),
    ("RT", "quat_wxyz"),
])
def test_score_forward_parity(ref, regression_head, pose_mode):
    from genpose_tpu.models.scorenet import PoseScoreNet
    from genpose_tpu.ops.pose import get_pose_dim

    tnet = ref["scorenet"].PoseScoreNet(
        _ve_marginal(ref), pose_mode, regression_head, False)
    _randomize(tnet, seed=3)
    tnet.eval()

    pose_dim = get_pose_dim(pose_mode)
    rng = np.random.RandomState(7)
    pts_feat = rng.randn(6, 1024).astype(np.float32)
    pose = rng.randn(6, pose_dim).astype(np.float32)
    t = rng.uniform(1e-3, 1.0, (6, 1)).astype(np.float32)

    with torch.no_grad():
        t_out = tnet({
            "pts_feat": torch.from_numpy(pts_feat),
            "sampled_pose": torch.from_numpy(pose),
            "t": torch.from_numpy(t),
        }).numpy()

    sde = init_sde("ve")
    jnet = PoseScoreNet(marginal_prob_fn=sde.marginal_prob,
                        pose_mode=pose_mode, regression_head=regression_head)
    template = jnet.init(jax.random.PRNGKey(0), jnp.asarray(pts_feat),
                         jnp.asarray(pose), jnp.asarray(t))
    trunk_p, _ = port_trunk(tnet.state_dict(), "",
                            regression_head=regression_head)
    jax.tree_util.tree_map(
        lambda a, b: None,  # raises on any structure mismatch
        template["params"]["trunk"], trunk_p)
    j_out = np.asarray(jnet.apply(
        {"params": {"trunk": trunk_p}}, jnp.asarray(pts_feat),
        jnp.asarray(pose), jnp.asarray(t)))

    np.testing.assert_allclose(j_out, t_out, rtol=1e-4, atol=2e-4)


def test_score_forward_parity_per_point(ref):
    """Per-point RotHead/TransHead variant (``scorenet.py:146-149,198-204``,
    ``decoder_head/rot_head.py:8-35``)."""
    from genpose_tpu.models.scorenet import PoseScoreNet

    tnet = ref["scorenet"].PoseScoreNet(
        _ve_marginal(ref), "rot_matrix", "Rx_Ry_and_T", True)
    _randomize(tnet, seed=11)
    tnet.eval()

    rng = np.random.RandomState(13)
    n_pts = 24
    pts_feat = rng.randn(4, 1280, n_pts).astype(np.float32)  # torch: [bs, C, N]
    pose = rng.randn(4, 9).astype(np.float32)
    t = rng.uniform(1e-3, 1.0, (4, 1)).astype(np.float32)

    with torch.no_grad():
        t_out = tnet({
            "pts_feat": torch.from_numpy(pts_feat),
            "sampled_pose": torch.from_numpy(pose),
            "t": torch.from_numpy(t),
        }).numpy()

    sde = init_sde("ve")
    jnet = PoseScoreNet(marginal_prob_fn=sde.marginal_prob,
                        pose_mode="rot_matrix", regression_head="Rx_Ry_and_T",
                        per_point_feature=True, pts_feat_dim=1280)
    pts_feat_j = jnp.asarray(np.transpose(pts_feat, (0, 2, 1)))  # [bs, N, C]
    template = jnet.init(jax.random.PRNGKey(0), pts_feat_j, jnp.asarray(pose),
                         jnp.asarray(t))
    trunk_p, trunk_s = port_trunk(tnet.state_dict(), "",
                                  regression_head="Rx_Ry_and_T",
                                  per_point_feature=True, pts_feat_dim=1280)
    # param-count parity (VERDICT item 6): every torch parameter is ported
    n_torch = sum(p.numel() for p in tnet.parameters())
    n_flax = sum(int(np.prod(np.shape(x)))
                 for x in jax.tree_util.tree_leaves(trunk_p))
    assert n_torch == n_flax
    jax.tree_util.tree_map(lambda a, b: None, template["params"]["trunk"], trunk_p)
    jax.tree_util.tree_map(lambda a, b: None, template["batch_stats"]["trunk"],
                           trunk_s)

    j_out = np.asarray(jnet.apply(
        {"params": {"trunk": trunk_p}, "batch_stats": {"trunk": trunk_s}},
        pts_feat_j, jnp.asarray(pose), jnp.asarray(t)))
    np.testing.assert_allclose(j_out, t_out, rtol=1e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# EDM decoder parity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("regression_head,pose_mode", [
    ("RT", "rot_matrix"),
    ("R_and_T", "rot_matrix"),
    ("Rx_Ry_and_T", "rot_matrix"),
])
def test_decoder_forward_parity(ref, regression_head, pose_mode):
    """``PoseDecoderNet`` denoiser forward vs the torch reference with ported
    weights (``scorenet.py:225-364``): certifies the PositionalEmbedding,
    the c_noise=log(sigma/2) path, the [pts, sigma, pose] concat order, and
    the shared-tails kernel repacking.  Includes param-count equality."""
    from genpose_tpu.models.scorenet import PoseDecoderNet
    from genpose_tpu.ops.pose import get_pose_dim
    from genpose_tpu.utils.torch_port import port_decoder

    _, edm_marginal, _, _, _ = ref["sde"].init_sde("edm")
    tnet = ref["scorenet"].PoseDecoderNet(
        edm_marginal, 1.4148, pose_mode, regression_head)
    _randomize(tnet, seed=21)
    tnet.eval()

    pose_dim = get_pose_dim(pose_mode)
    rng = np.random.RandomState(23)
    pts_feat = rng.randn(6, 1024).astype(np.float32)
    pose = rng.randn(6, pose_dim).astype(np.float32)
    # sigma == t in EDM; cover the whole log ladder
    t = np.exp(rng.uniform(np.log(0.002), np.log(80.0), (6, 1))).astype(
        np.float32)

    with torch.no_grad():
        t_out = tnet({
            "pts_feat": torch.from_numpy(pts_feat),
            "sampled_pose": torch.from_numpy(pose),
            "t": torch.from_numpy(t),
        }).numpy()

    sde = init_sde("edm")
    jnet = PoseDecoderNet(marginal_prob_fn=sde.marginal_prob,
                          pose_mode=pose_mode, regression_head=regression_head)
    template = jnet.init(jax.random.PRNGKey(0), jnp.asarray(pts_feat),
                         jnp.asarray(pose), jnp.asarray(t))
    dec_p = port_decoder(tnet.state_dict(), "", regression_head=regression_head)

    n_torch = sum(p.numel() for p in tnet.parameters())
    n_flax = sum(int(np.prod(np.shape(x)))
                 for x in jax.tree_util.tree_leaves(dec_p))
    assert n_torch == n_flax
    jax.tree_util.tree_map(lambda a, b: None, template["params"], dec_p)

    j_out = np.asarray(jnet.apply(
        {"params": dec_p}, jnp.asarray(pts_feat), jnp.asarray(pose),
        jnp.asarray(t)))
    np.testing.assert_allclose(j_out, t_out, rtol=1e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# energy network parity (forward + autograd score)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("energy_mode,s_theta_mode,norm_energy", [
    ("IP", "score", "identical"),   # released default (configs/config.py:40-42)
    ("IP", "decoder", "std"),
    ("DAE", "score", "minus"),
    ("L2", "identical", "identical"),
    ("DAE", "decoder", "std"),
])
def test_energy_forward_and_score_parity(ref, energy_mode, s_theta_mode,
                                         norm_energy):
    from genpose_tpu.models.energynet import PoseEnergyNet

    tnet = ref["energynet"].PoseEnergyNet(
        _ve_marginal(ref), "rot_matrix", "Rx_Ry_and_T", device="cpu",
        energy_mode=energy_mode, s_theta_mode=s_theta_mode,
        norm_energy=norm_energy)
    _randomize(tnet, seed=5)
    tnet.eval()

    rng = np.random.RandomState(9)
    pts_feat = rng.randn(5, 1024).astype(np.float32)
    pose = rng.randn(5, 9).astype(np.float32)
    t = rng.uniform(1e-3, 1.0, (5, 1)).astype(np.float32)
    data = {
        "pts_feat": torch.from_numpy(pts_feat),
        "sampled_pose": torch.from_numpy(pose),
        "t": torch.from_numpy(t),
    }
    with torch.no_grad():
        t_energy = tnet(data, return_item="energy").numpy()
    if norm_energy == "std":
        # Reference bug (energynet.py:192-193 with the non-decoupled [bs]
        # energy of the score path): dividing a [bs] energy by a [bs,1] std
        # silently broadcasts to [bs,bs], inflating the autograd score of
        # sample i by sigma_i * sum_j 1/sigma_j.  This framework normalizes
        # per sample (the intended semantics; see PARITY.md).  Compare at
        # bs=1 where the broadcast is the identity.
        t_score = np.concatenate([
            tnet({k: v[i:i + 1] for k, v in data.items()},
                 return_item="score").detach().numpy()
            for i in range(pose.shape[0])
        ], axis=0)
    else:
        t_score = tnet(data, return_item="score").detach().numpy()

    sde = init_sde("ve")
    jnet = PoseEnergyNet(marginal_prob_fn=sde.marginal_prob,
                         pose_mode="rot_matrix",
                         regression_head="Rx_Ry_and_T",
                         energy_mode=energy_mode, s_theta_mode=s_theta_mode,
                         norm_energy=norm_energy)
    template = jnet.init(jax.random.PRNGKey(0), jnp.asarray(pts_feat),
                         jnp.asarray(pose), jnp.asarray(t))
    trunk_p, _ = port_trunk(tnet.state_dict(), "",
                            regression_head="Rx_Ry_and_T")
    jax.tree_util.tree_map(lambda a, b: None, template["params"]["trunk"], trunk_p)
    variables = {"params": {"trunk": trunk_p}}

    j_energy = np.asarray(jnet.apply(
        variables, jnp.asarray(pts_feat), jnp.asarray(pose), jnp.asarray(t),
        decoupled_rt=True))
    if j_energy.ndim == 1 and t_energy.shape == (len(pose), len(pose)):
        # same reference broadcast bug in the DAE/L2 energy path: the [bs]
        # energy divided by the [bs,1] std returns the full [bs,bs] outer
        # matrix; its diagonal is the intended per-sample value
        t_energy = np.diag(t_energy)
    np.testing.assert_allclose(j_energy, t_energy, rtol=1e-4, atol=2e-4)

    # score = grad of summed (non-decoupled) energy w.r.t. pose
    # (ref energynet.py:210-215)
    def energy_sum(p):
        e = jnet.apply(variables, jnp.asarray(pts_feat), p, jnp.asarray(t),
                       decoupled_rt=False)
        return jnp.sum(e)

    j_score = np.asarray(jax.grad(energy_sum)(jnp.asarray(pose)))
    np.testing.assert_allclose(j_score, t_score, rtol=5e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# ranking / sorting parity
# ---------------------------------------------------------------------------

def test_ranking_loss_parity(ref):
    from genpose_tpu.training.ranking import ranking_loss, sort_results

    rng = np.random.RandomState(21)
    energy = rng.randn(4, 7, 2).astype(np.float32)
    metrics = np.abs(rng.randn(4, 7, 2)).astype(np.float32)

    t_sorted = ref["reward"].sort_results(
        torch.from_numpy(energy), torch.from_numpy(metrics))
    t_loss = float(ref["reward"].ranking_loss(t_sorted))

    j_sorted = sort_results(jnp.asarray(energy), jnp.asarray(metrics))
    np.testing.assert_allclose(np.asarray(j_sorted), t_sorted.numpy(),
                               rtol=0, atol=0)
    j_loss = float(ranking_loss(j_sorted))
    assert abs(j_loss - t_loss) < 1e-6


def test_sort_poses_by_energy_parity(ref):
    from genpose_tpu.training.ranking import sort_poses_by_energy

    rng = np.random.RandomState(22)
    poses = rng.randn(3, 6, 9).astype(np.float32)
    energy = rng.randn(3, 6, 2).astype(np.float32)

    t_poses, t_energy = ref["reward"].sort_poses_by_energy(
        torch.from_numpy(poses).clone(), torch.from_numpy(energy))
    j_poses, j_energy = sort_poses_by_energy(jnp.asarray(poses),
                                             jnp.asarray(energy))
    np.testing.assert_allclose(np.asarray(j_energy), t_energy.numpy(), atol=0)
    np.testing.assert_allclose(np.asarray(j_poses), t_poses.numpy(), atol=0)


# ---------------------------------------------------------------------------
# full-model port (GFObjectPose state_dict -> flax variables)
# ---------------------------------------------------------------------------

def test_full_gf_state_dict_port(ref):
    """Port a full torch GFObjectPose (pointnet2 encoder + score head) onto
    the flax model and check head forward parity.  The torch encoder cannot
    run here (compiled CUDA ops), but every encoder weight is mapped and
    shape-checked against the flax template."""
    import types

    posenet_mod = import_reference("networks.posenet")
    cfg = types.SimpleNamespace(
        device="cpu", pts_encoder="pointnet2", pose_mode="rot_matrix",
        regression_head="Rx_Ry_and_T", posenet_mode="score",
        energy_mode="IP", s_theta_mode="score", norm_energy="identical",
        num_points=1024, sampling_steps=500, sde_mode="ve",
    )
    prior_fn, marginal_prob_fn, sde_fn, eps, T = ref["sde"].init_sde("ve")
    tnet = posenet_mod.GFObjectPose(cfg, prior_fn, marginal_prob_fn, sde_fn,
                                    eps, T)
    _randomize(tnet, seed=17)
    tnet.eval()
    sd = tnet.state_dict()

    from genpose_tpu.models.posenet import GFObjectPose

    sde = init_sde("ve")
    jnet = GFObjectPose(marginal_prob_fn=sde.marginal_prob,
                        pose_mode="rot_matrix",
                        regression_head="Rx_Ry_and_T", posenet_mode="score",
                        pts_encoder="pointnet2", pointnet2_params="light",
                        num_points=64)
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (2, 64, 3)) * 0.1
    pose = jax.random.normal(key, (2, 9))
    t = jnp.full((2, 1), 0.5)
    template = jnet.init(key, pts, pose, t, train=False)

    variables = port_gf_state_dict(sd, template, pts_encoder="pointnet2",
                                   regression_head="Rx_Ry_and_T")

    # head forward parity with the ported full-model variables
    rng = np.random.RandomState(23)
    pts_feat = rng.randn(4, 1024).astype(np.float32)
    pose_np = rng.randn(4, 9).astype(np.float32)
    t_np = rng.uniform(1e-3, 1.0, (4, 1)).astype(np.float32)
    with torch.no_grad():
        t_out = tnet({
            "pts_feat": torch.from_numpy(pts_feat),
            "sampled_pose": torch.from_numpy(pose_np),
            "t": torch.from_numpy(t_np),
        }, mode="score").numpy()
    j_out = np.asarray(jnet.apply(
        variables, jnp.asarray(pts_feat), jnp.asarray(pose_np),
        jnp.asarray(t_np), method=GFObjectPose.score))
    np.testing.assert_allclose(j_out, t_out, rtol=1e-4, atol=2e-4)


def _build_ported_gf(ref, seed: int = 29, scale: float = 0.1):
    """Build a randomized reference GFObjectPose (score mode, pointnet2
    'light') AND the flax twin with fully ported weights.  The reference
    encoder is runnable on CPU because the compiled CUDA ops are
    re-implemented in pure torch by ``_reference_bridge``."""
    import types

    posenet_mod = import_reference("networks.posenet")
    cfg = types.SimpleNamespace(
        device="cpu", pts_encoder="pointnet2", pose_mode="rot_matrix",
        regression_head="Rx_Ry_and_T", posenet_mode="score",
        energy_mode="IP", s_theta_mode="score", norm_energy="identical",
        num_points=1024, sampling_steps=500, sde_mode="ve",
    )
    prior_fn, marginal_prob_fn, sde_fn, eps, T = ref["sde"].init_sde("ve")
    tnet = posenet_mod.GFObjectPose(cfg, prior_fn, marginal_prob_fn, sde_fn,
                                    eps, T)
    rb.randomize_net(tnet, seed, scale)
    tnet.eval()

    from genpose_tpu.models.posenet import GFObjectPose

    sde = init_sde("ve")
    jnet = GFObjectPose(marginal_prob_fn=sde.marginal_prob,
                        pose_mode="rot_matrix",
                        regression_head="Rx_Ry_and_T", posenet_mode="score",
                        pts_encoder="pointnet2", pointnet2_params="light",
                        num_points=1024)
    key = jax.random.PRNGKey(0)
    template = jnet.init(key, jax.random.normal(key, (2, 64, 3)) * 0.1,
                         jnp.zeros((2, 9)), jnp.full((2, 1), 0.5),
                         train=False)
    variables = port_gf_state_dict(tnet.state_dict(), template,
                                   pts_encoder="pointnet2",
                                   regression_head="Rx_Ry_and_T")
    return tnet, jnet, variables, sde_fn


def test_full_forward_parity_with_encoder(ref):
    """End-to-end golden test on RAW point clouds: the reference GFObjectPose
    runs its real PointNet++ encoder (the compiled CUDA ops are re-implemented
    in pure torch by ``_reference_bridge._make_pointnet2_cuda``) and the
    flax model with ported weights must reproduce both the 1024-d pts feature
    and the final score output.  This certifies the ENCODER numerics — FPS
    selection, ball-query membership/padding, MSG per-radius concat order,
    use_xyz centering, SharedMLP BN(eval) and max-pool — which the head-only
    parity tests cannot see.  Ref: ``pointnet2.py:166-211``,
    ``pointnet2_modules.py:10-93``, ``posenet.py:71-91``."""
    from genpose_tpu.models.posenet import GFObjectPose

    tnet, jnet, variables, _ = _build_ported_gf(ref, seed=29, scale=0.1)

    rng = np.random.RandomState(31)
    pts = (rng.randn(2, 1024, 3) * 0.1).astype(np.float32)
    pose_np = rng.randn(2, 9).astype(np.float32)
    t_np = rng.uniform(1e-3, 1.0, (2, 1)).astype(np.float32)

    with torch.no_grad():
        feat_t = tnet.extract_pts_feature({"pts": torch.from_numpy(pts)})
        out_t = tnet({
            "pts_feat": feat_t,
            "sampled_pose": torch.from_numpy(pose_np),
            "t": torch.from_numpy(t_np),
        }, mode="score").numpy()
        feat_t = feat_t.numpy()

    feat_j = np.asarray(jnet.apply(variables, jnp.asarray(pts), train=False,
                                   method=GFObjectPose.encode_pts))
    np.testing.assert_allclose(feat_j, feat_t, rtol=2e-3, atol=2e-3)

    out_j = np.asarray(jnet.apply(variables, jnp.asarray(feat_j),
                                  jnp.asarray(pose_np), jnp.asarray(t_np),
                                  method=GFObjectPose.score))
    np.testing.assert_allclose(out_j, out_t, rtol=2e-3, atol=2e-3)


def test_ode_sampler_parity_with_reference_scipy(ref):
    """The whole inference integrator, cross-implementation: the reference's
    ``cond_ode_sampler`` (scipy ``solve_ivp`` RK45 at atol/rtol 1e-5 with a
    host round-trip per step, ``samplers.py:163-227``) vs our on-device
    adaptive RK45 — same ported score net, same start pose (the reference's
    additive prior draw is zeroed via its injectable ``prior`` argument),
    protocol T0=0.55, denoise off on both sides.  Endpoints agree to float
    precision (measured 2.4e-7; asserted at 1e-5)."""
    import dataclasses

    from genpose_tpu.diffusion.samplers import ode_sampler_adaptive
    from genpose_tpu.models.posenet import GFObjectPose

    samplers_mod = import_reference("networks.gf_algorithms.samplers")
    tnet, jnet, variables, sde_fn = _build_ported_gf(ref, seed=29, scale=0.02)

    rng = np.random.RandomState(5)
    bs = 2
    pts = (rng.randn(bs, 1024, 3) * 0.1).astype(np.float32)
    x0 = (rng.randn(bs, 9) * 5.0).astype(np.float32)
    center = np.zeros((bs, 3), np.float32)

    with torch.no_grad():
        feat_t = tnet.extract_pts_feature({"pts": torch.from_numpy(pts)})
    data = {"pts": torch.from_numpy(pts), "pts_feat": feat_t,
            "pts_center": torch.from_numpy(center)}
    _, x_ref = samplers_mod.cond_ode_sampler(
        score_model=tnet, data=data,
        prior=lambda shape, T=None: torch.zeros(shape), sde_coeff=sde_fn,
        atol=1e-5, rtol=1e-5, device="cpu", eps=1e-5, T=0.55, num_steps=None,
        pose_mode="rot_matrix", denoise=False, init_x=torch.from_numpy(x0))
    x_ref = x_ref.numpy()

    sde = init_sde("ve")
    feat_j = jnet.apply(variables, jnp.asarray(pts), train=False,
                        method=GFObjectPose.encode_pts)
    projs = jnet.apply(variables, feat_j, method=GFObjectPose.precompute_head)

    def score_fn(pose, t):
        return jnet.apply(variables, projs, pose, t,
                          method=GFObjectPose.score_with)

    sde_z = dataclasses.replace(
        sde, prior=lambda k, shape, T=None: jnp.zeros(shape))
    _, x_j, stats = ode_sampler_adaptive(
        score_fn, jax.random.PRNGKey(1), bs, sde_z, pose_mode="rot_matrix",
        denoise=False, init_x=jnp.asarray(x0), pts_center=jnp.asarray(center),
        T0=0.55, return_stats=True)
    assert bool(stats["converged"])
    np.testing.assert_allclose(np.asarray(x_j), x_ref, rtol=1e-5, atol=1e-5)


def test_ode_likelihood_parity_with_reference_scipy(ref):
    """The PF-ODE log-likelihood path, cross-implementation: the reference's
    ``cond_ode_likelihood`` (scipy ``solve_ivp`` RK45 on the joint (x, logp)
    system with a single-probe Skilling-Hutchinson divergence,
    ``samplers.py:22-99``) vs our ``ode_likelihood`` with the SAME fixed
    probe injected (``exact_divergence=False``) on the same ported score
    net.  The latent z and the per-sample bits agree to integration
    tolerance.  (Our default exact-trace divergence is checked against the
    Hutchinson run only loosely — they estimate the same quantity but with
    different estimator variance.)"""
    from genpose_tpu.diffusion.samplers import ode_likelihood
    from genpose_tpu.models.posenet import GFObjectPose

    samplers_mod = import_reference("networks.gf_algorithms.samplers")
    tnet, jnet, variables, sde_fn = _build_ported_gf(ref, seed=37, scale=0.02)

    rng = np.random.RandomState(11)
    bs = 2
    pts = (rng.randn(bs, 1024, 3) * 0.1).astype(np.float32)
    x0 = (rng.randn(bs, 9) * 2.0).astype(np.float32)
    probe = rng.randn(bs, 9).astype(np.float32)

    with torch.no_grad():
        feat_t = tnet.extract_pts_feature({"pts": torch.from_numpy(pts)})
    data = {"pts": torch.from_numpy(pts), "pts_feat": feat_t,
            "sampled_pose": torch.from_numpy(x0)}
    z_ref, ll_ref = samplers_mod.cond_ode_likelihood(
        score_model=tnet, data=data,
        prior=lambda shape, T=None: torch.from_numpy(probe.copy()),
        sde_coeff=sde_fn, marginal_prob_fn=tnet.marginal_prob_fn,
        atol=1e-5, rtol=1e-5, device="cpu", eps=1e-5,
        pose_mode="rot_matrix")
    z_ref, ll_ref = z_ref.numpy(), ll_ref.numpy()

    sde = init_sde("ve")
    feat_j = jnet.apply(variables, jnp.asarray(pts), train=False,
                        method=GFObjectPose.encode_pts)
    projs = jnet.apply(variables, feat_j, method=GFObjectPose.precompute_head)

    def score_fn(pose, t):
        return jnet.apply(variables, projs, pose, t,
                          method=GFObjectPose.score_with)

    z_j, ll_j = ode_likelihood(
        score_fn, jax.random.PRNGKey(3), jnp.asarray(x0), sde,
        pose_mode="rot_matrix", num_steps=1000, exact_divergence=False,
        epsilon=jnp.asarray(probe))
    np.testing.assert_allclose(np.asarray(z_j), z_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ll_j), ll_ref, rtol=1e-3, atol=5e-3)

    # exact-trace divergence estimates the same integral; same sign/scale
    z_e, ll_e = ode_likelihood(
        score_fn, jax.random.PRNGKey(3), jnp.asarray(x0), sde,
        pose_mode="rot_matrix", num_steps=1000, exact_divergence=True)
    np.testing.assert_allclose(np.asarray(z_e), z_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ll_e), ll_ref, rtol=0.05, atol=1.0)


def test_edm_sampler_parity_with_reference(ref):
    """The EDM Heun sampler end-to-end: the reference's ``cond_edm_sampler``
    (``samplers.py:230-290``; deterministic at the default S_churn=0) vs our
    ``edm_sampler`` with the SAME injected unit latents on the same ported
    ``PoseDecoderNet``.  Certifies the Karras rho-ladder discretization, the
    Euler + 2nd-order-correction arithmetic, the last-step guard, and the
    rotation-normalize + pts_center post-processing.  (The reference
    integrates the loop in float64; ours is float32 on-device — tolerance
    1e-4.)"""
    from genpose_tpu.diffusion.samplers import edm_sampler
    from genpose_tpu.models.scorenet import PoseDecoderNet
    from genpose_tpu.utils.torch_port import port_decoder

    samplers_mod = import_reference("networks.gf_algorithms.samplers")
    _, edm_marginal, _, _, _ = ref["sde"].init_sde("edm")
    tnet = ref["scorenet"].PoseDecoderNet(
        edm_marginal, 1.4148, "rot_matrix", "Rx_Ry_and_T")
    _randomize(tnet, seed=43)
    tnet.eval()

    rng = np.random.RandomState(17)
    bs = 3
    pts_feat = (rng.randn(bs, 1024) * 0.1).astype(np.float32)
    latents = rng.randn(bs, 9).astype(np.float32)
    center = (rng.randn(bs, 3) * 0.05).astype(np.float32)

    data = {"pts": torch.zeros((bs, 8, 3)),
            "pts_feat": torch.from_numpy(pts_feat),
            "pts_center": torch.from_numpy(center),
            "sampled_pose": torch.zeros((bs, 9)),
            "t": torch.zeros((bs, 1))}

    def decoder(d):
        """cond_edm_sampler expects ``decoder(data) -> (data, denoised)``
        and feeds float64 poses and a scalar t (``samplers.py:246-254``) —
        cast to the net's float32 [bs, 1] interface (the EDM path is dead
        code in the reference; no released caller pins this glue)."""
        t = torch.as_tensor(d["t"], dtype=torch.float32)
        cast = {**d,
                "sampled_pose": d["sampled_pose"].to(torch.float32),
                "t": t.expand(bs).reshape(bs, 1) if t.dim() == 0
                else t.reshape(bs, 1)}
        with torch.no_grad():
            return d, tnet(cast)

    # The reference's post-processing CRASHES on its own: the stray
    # ``x_next.unsqueeze(0)`` (samplers.py:278) makes the stacked xs 4-D
    # [num_steps, 1, bs, d], so ``x = xs[-1]`` is [1, bs, d] and
    # ``x[:, :-3]`` slices the instance axis instead of the channels
    # (samplers.py:287) — EDM is dead code upstream, nothing ever ran it.
    # Neutralize exactly that artifact with a scoped stack shim so the rest
    # of the reference arithmetic runs as written.
    real_stack = torch.stack

    def _squeeze_stack(ts, dim=0):
        out = real_stack(ts, dim)
        return out.squeeze(1) if out.dim() == 4 and out.shape[1] == 1 else out

    torch.stack = _squeeze_stack
    try:
        _, x_ref = samplers_mod.cond_edm_sampler(
            decoder_model=decoder, data=data,
            prior_fn=lambda shape: torch.from_numpy(latents.copy()),
            num_steps=18, pose_mode="rot_matrix", device="cpu")
    finally:
        torch.stack = real_stack
    x_ref = x_ref.numpy()

    sde = init_sde("edm")
    jnet = PoseDecoderNet(marginal_prob_fn=sde.marginal_prob,
                          pose_mode="rot_matrix",
                          regression_head="Rx_Ry_and_T")
    dec_p = port_decoder(tnet.state_dict(), "", regression_head="Rx_Ry_and_T")
    feat_j = jnp.asarray(pts_feat)

    def denoise_fn(x, t):
        return jnet.apply({"params": dec_p}, feat_j, x, t)

    _, x_j = edm_sampler(
        denoise_fn, jax.random.PRNGKey(2), bs, pose_mode="rot_matrix",
        num_steps=18, pts_center=jnp.asarray(center),
        latents=jnp.asarray(latents))
    np.testing.assert_allclose(np.asarray(x_j), x_ref, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# compute_mAP parity
# ---------------------------------------------------------------------------

def _random_rot(rng) -> np.ndarray:
    from scipy.spatial.transform import Rotation as R

    return R.random(random_state=rng).as_matrix()


def _make_scene(rng, n_instances: int, K: int = 5, descending_scores=True):
    """One NOCS-style result dict consumed by both compute_mAP versions."""
    cls_ids, gt_RTs, gt_scales, gt_hv, gt_bboxes = [], [], [], [], []
    pred_ids, multi_RTs, energies, pred_scales, pred_bboxes = (
        [], [], [], [], [])
    for i in range(n_instances):
        cls_id = int(rng.randint(1, 7))
        s = float(rng.uniform(0.8, 1.2))
        Rm = _random_rot(rng)
        tvec = rng.uniform(-0.3, 0.3, 3)
        sRT = np.eye(4)
        sRT[:3, :3] = s * Rm
        sRT[:3, 3] = tvec
        cls_ids.append(cls_id)
        gt_RTs.append(sRT)
        gt_scales.append(rng.uniform(0.05, 0.3, 3))
        gt_hv.append(int(rng.randint(0, 2)))
        y1, x1 = rng.randint(0, 300, 2)
        box = np.array([y1, x1, y1 + rng.randint(40, 120),
                        x1 + rng.randint(40, 120)])
        gt_bboxes.append(box)

        # one prediction per GT: K noisy hypotheses around the GT
        pred_ids.append(cls_id)
        hyps = []
        for _ in range(K):
            from scipy.spatial.transform import Rotation as R

            dR = R.from_rotvec(rng.randn(3) * 0.05).as_matrix()
            dT = rng.randn(3) * 0.01
            h = np.eye(4)
            h[:3, :3] = s * (Rm @ dR)
            h[:3, 3] = tvec + dT
            hyps.append(h)
        multi_RTs.append(np.stack(hyps))
        energies.append(np.sort(rng.randn(K, 2), axis=0)[::-1])
        pred_scales.append(gt_scales[-1] * rng.uniform(0.9, 1.1))
        pred_bboxes.append(box + rng.randint(-5, 5, 4))

    n_pred = len(pred_ids)
    if descending_scores:
        scores = np.linspace(0.99, 0.5, n_pred)
    else:
        scores = rng.uniform(0.5, 0.99, n_pred)
    return {
        "gt_class_ids": np.array(cls_ids, np.int32),
        "gt_RTs": np.stack(gt_RTs),
        "gt_scales": np.stack(gt_scales),
        "gt_handle_visibility": np.array(gt_hv, np.int32),
        "gt_bboxes": np.stack(gt_bboxes),
        "pred_class_ids": np.array(pred_ids, np.int32),
        "multi_hypothesis_pred_RTs": np.stack(multi_RTs),
        "energy": np.ascontiguousarray(np.stack(energies)),
        "pred_scales": np.stack(pred_scales),
        "pred_scores": scores,
        "pred_bboxes": np.stack(pred_bboxes),
    }


@pytest.mark.parametrize("pooling_mode", ["average", "nearest"])
def test_compute_mAP_parity(ref, tmp_path, pooling_mode):
    from genpose_tpu.eval.nocs_eval import compute_mAP as j_compute_mAP

    rng = np.random.RandomState(31)
    scenes = [_make_scene(rng, n_instances=int(rng.randint(2, 5)))
              for _ in range(4)]

    kwargs = dict(
        degree_thresholds=[5, 10], shift_thresholds=[2, 5, 10],
        iou_3d_thresholds=[0.1, 0.25], iou_pose_thres=0.1,
        use_matches_for_pose=True, repeat_num=5,
        pooling_mode=pooling_mode, ratio=0.6, ranker="energy_ranker",
    )
    ref_out = str(tmp_path / "ref")
    my_out = str(tmp_path / "mine")
    import os

    os.makedirs(ref_out), os.makedirs(my_out)
    t_iou, t_pose, t_iou_acc, t_pose_acc = ref["sgpa"].compute_mAP(
        [dict(s) for s in scenes], ref_out, **kwargs)
    j_iou, j_pose, j_iou_acc, j_pose_acc = j_compute_mAP(
        [dict(s) for s in scenes], my_out, **kwargs)

    np.testing.assert_allclose(j_iou, t_iou, atol=1e-9)
    np.testing.assert_allclose(j_pose, t_pose, atol=1e-9)
    np.testing.assert_allclose(j_iou_acc, t_iou_acc, atol=1e-9)
    np.testing.assert_allclose(j_pose_acc, t_pose_acc, atol=1e-9)
    # sanity: near-GT hypotheses must actually score (not trivially 0 == 0)
    assert t_pose[-1].max() > 0.5


def test_port_torch_ckpt_roundtrip(ref, tmp_path):
    """torch .pth -> tools/port_torch_ckpt.py -> orbax -> load_checkpoint:
    the loaded agent's head must reproduce the torch forward (VERDICT item 5;
    ref ``posenet_agent.py:117-173`` is what the .pth contains)."""
    import sys
    import types

    posenet_mod = import_reference("networks.posenet")
    cfg_t = types.SimpleNamespace(
        device="cpu", pts_encoder="pointnet2", pose_mode="rot_matrix",
        regression_head="Rx_Ry_and_T", posenet_mode="score",
        energy_mode="IP", s_theta_mode="score", norm_energy="identical",
        num_points=1024, sampling_steps=500, sde_mode="ve",
    )
    prior_fn, marginal_prob_fn, sde_fn, eps, T = ref["sde"].init_sde("ve")
    tnet = posenet_mod.GFObjectPose(cfg_t, prior_fn, marginal_prob_fn, sde_fn,
                                    eps, T)
    _randomize(tnet, seed=29)
    tnet.eval()
    pth = tmp_path / "ckpt_epoch7.pth"
    torch.save({
        "clock": {"epoch": 7, "minibatch": 0, "step": 1234},
        "model_state_dict": tnet.state_dict(),
    }, str(pth))

    sys.path.insert(0, "/root/repo/tools")
    try:
        import port_torch_ckpt
    finally:
        sys.path.pop(0)
    out_dir = str(tmp_path / "orbax")
    ckpt_path = port_torch_ckpt.main([
        "--input", str(pth), "--output", out_dir,
        "--posenet_mode", "score", "--num_points", "64",
    ])
    assert ckpt_path.endswith("ckpt_epoch7")

    from genpose_tpu.config import Config
    from genpose_tpu.models.posenet import GFObjectPose
    from genpose_tpu.training.agent import PoseAgent
    from genpose_tpu.training.checkpoints import load_checkpoint, load_clock

    agent = PoseAgent(Config(num_points=64), "score")
    agent.state = load_checkpoint(ckpt_path, agent.state,
                                  load_model_only=True)
    clock = load_clock(out_dir)
    assert clock["epoch"] == 7 and clock["step"] == 1234

    rng = np.random.RandomState(37)
    pts_feat = rng.randn(3, 1024).astype(np.float32)
    pose_np = rng.randn(3, 9).astype(np.float32)
    t_np = rng.uniform(1e-3, 1.0, (3, 1)).astype(np.float32)
    with torch.no_grad():
        t_out = tnet({
            "pts_feat": torch.from_numpy(pts_feat),
            "sampled_pose": torch.from_numpy(pose_np),
            "t": torch.from_numpy(t_np),
        }, mode="score").numpy()
    # the .pth holds EMA-swapped weights -> they must land in BOTH the live
    # params and the EMA shadow (posenet_agent.py:124-126)
    for params in (agent.state.params, agent.state.ema.shadow):
        j_out = np.asarray(agent.model.apply(
            {"params": params, "batch_stats": agent.state.batch_stats},
            jnp.asarray(pts_feat), jnp.asarray(pose_np), jnp.asarray(t_np),
            method=GFObjectPose.score))
        np.testing.assert_allclose(j_out, t_out, rtol=1e-4, atol=2e-4)


def test_2d_match_deviation_documented(ref):
    """The reference sorts pred_class_ids/scores by score inside
    ``compute_2d_IoU_matches`` but forgets to reorder pred_bboxes
    (``sgpa_utils.py:489-494``), so with unsorted scores it matches box i's
    IoU against box order instead of score order.  This framework sorts the
    bboxes too (PARITY.md deviation).  Equivalence proof: our matcher on
    unsorted input == the reference's on pre-sorted input."""
    from genpose_tpu.eval.nocs_eval import compute_2d_IoU_matches as mine

    gt_ids = np.array([1, 1, 2], np.int32)
    gt_boxes = np.array([[0, 0, 50, 50], [60, 60, 120, 120], [10, 200, 80, 260]])
    pred_ids = np.array([1, 1, 2, 1], np.int32)
    pred_boxes = np.array(
        [[58, 58, 118, 118], [2, 2, 52, 52], [12, 198, 78, 258],
         [5, 5, 45, 45]])
    scores = np.array([0.6, 0.9, 0.8, 0.7])  # NOT descending
    thres = [0.1, 0.5]

    order = np.argsort(scores)[::-1]
    t_gt, t_pred, _, _ = ref["sgpa"].compute_2d_IoU_matches(
        gt_ids, gt_boxes, pred_ids[order], pred_boxes[order], scores[order],
        thres)
    j_gt, j_pred, _, j_idx = mine(gt_ids, gt_boxes, pred_ids, pred_boxes,
                                  scores, thres)
    np.testing.assert_array_equal(j_gt, t_gt)
    np.testing.assert_array_equal(j_pred, t_pred)
    np.testing.assert_array_equal(j_idx, order)
