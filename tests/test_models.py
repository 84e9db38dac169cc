"""Model construction, shape, init-behavior and parameter-count tests."""

import jax
import jax.numpy as jnp
import numpy as np

from genpose_tpu.diffusion import init_sde
from genpose_tpu.models import (
    GFObjectPose,
    PointNetfeat,
    Pointnet2ClsMSG,
    PoseEnergyNet,
    PoseScoreNet,
)
from genpose_tpu.models.posenet import make_encode_fn, make_energy_fn, make_score_fn

SDE = init_sde("ve")


def n_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


def test_scorenet_shapes_and_zero_init():
    net = PoseScoreNet(marginal_prob_fn=SDE.marginal_prob)
    key = jax.random.PRNGKey(0)
    pts_feat = jax.random.normal(key, (4, 1024))
    pose = jax.random.normal(key, (4, 9))
    t = jnp.full((4, 1), 0.5)
    variables = net.init(key, pts_feat, pose, t)
    out = net.apply(variables, pts_feat, pose, t)
    assert out.shape == (4, 9)
    # zero-initialized last layers => zero score at init (ref zero_module)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)


def test_scorenet_param_count_matches_reference():
    """Exact torch parameter count for PoseScoreNet Rx_Ry_and_T:
    pose encoder (9->256->256) + GaussianFourier W(64) + t dense (128->128)
    + 3 tails (1408->256->3)."""
    net = PoseScoreNet(marginal_prob_fn=SDE.marginal_prob)
    key = jax.random.PRNGKey(0)
    variables = net.init(key, jnp.zeros((1, 1024)), jnp.zeros((1, 9)),
                         jnp.full((1, 1), 0.5))
    expected = (
        (9 * 256 + 256) + (256 * 256 + 256)        # pose encoder
        + 64                                        # fourier W (fixed)
        + (128 * 128 + 128)                         # t dense
        + 3 * ((1408 * 256 + 256) + (256 * 3 + 3))  # three tails
    )
    assert n_params(variables["params"]) == expected


def test_scorenet_std_normalization():
    """Output is divided by sigma(t)+1e-7 (ref scorenet.py:205-217)."""
    net = PoseScoreNet(marginal_prob_fn=SDE.marginal_prob)
    key = jax.random.PRNGKey(1)
    variables = net.init(key, jnp.zeros((2, 1024)), jnp.zeros((2, 9)),
                         jnp.full((2, 1), 0.5))
    # overwrite the trans tail's output bias so output is nonzero
    # (fused bank: tail order is rot_x, rot_y, trans)
    params = jax.tree_util.tree_map(lambda p: p, variables["params"])
    params["trunk"]["tails"]["out_bias"] = (
        params["trunk"]["tails"]["out_bias"].at[2].set(jnp.ones(3)))
    pts_feat = jnp.zeros((2, 1024))
    pose = jnp.zeros((2, 9))
    for tval in (0.2, 0.8):
        t = jnp.full((2, 1), tval)
        out = net.apply({"params": params}, pts_feat, pose, t)
        _, std = SDE.marginal_prob(None, tval)
        np.testing.assert_allclose(np.asarray(out[:, 6:]), 1.0 / (float(std) + 1e-7),
                                   rtol=1e-5)


def test_pointnet2_output_shape():
    enc = Pointnet2ClsMSG(input_channels=0, config="light")
    key = jax.random.PRNGKey(2)
    pts = jax.random.normal(key, (2, 1024, 3))
    variables = enc.init(key, pts, train=False)
    out = enc.apply(variables, pts, train=False)
    assert out.shape == (2, 1024)  # 512 + 512 concat (ClsMSG_CFG_Light)


def test_pointnet2_param_count_matches_reference():
    """Conv params (no bias under BN) + BN scale/bias + BN running stats,
    computed from the transcribed config — must equal the torch build."""
    from genpose_tpu.models.pointnet2 import CLS_MSG_CONFIGS

    cfg = CLS_MSG_CONFIGS["light"]
    exp_params, exp_stats = 0, 0
    c_in = 0
    for k in range(len(cfg["NPOINTS"])):
        c_out_total = 0
        for mlp in cfg["MLPS"][k]:
            chain = [c_in + 3] + list(mlp)  # use_xyz adds 3
            for a, b in zip(chain[:-1], chain[1:]):
                exp_params += a * b + 2 * b  # kernel + BN scale/bias
                exp_stats += 2 * b           # BN running mean/var
            c_out_total += mlp[-1]
        c_in = c_out_total

    enc = Pointnet2ClsMSG(input_channels=0, config="light")
    key = jax.random.PRNGKey(3)
    variables = enc.init(key, jnp.zeros((1, 128, 3)), train=False)
    assert n_params(variables["params"]) == exp_params
    assert n_params(variables["batch_stats"]) == exp_stats


def test_pointnet2_shared_geometry_is_exact():
    """Precomputed weight-independent geometry (FPS + ball query + grouped
    coords, shared across encoders in a pipeline) must reproduce the inline
    path BIT-exactly — gathers are exact and the coordinate math is
    identical."""
    from genpose_tpu.models.pointnet2 import cls_msg_geometry

    enc = Pointnet2ClsMSG(input_channels=0, config="light")
    key = jax.random.PRNGKey(11)
    pts = jax.random.normal(key, (2, 256, 3)) * 0.1
    variables = enc.init(key, pts, train=False)

    geom = jax.jit(lambda p: cls_msg_geometry(p, "light"))(pts)
    f_inline = enc.apply(variables, pts, train=False)
    f_shared = enc.apply(variables, pts, train=False, geometry=geom)
    np.testing.assert_array_equal(np.asarray(f_inline), np.asarray(f_shared))

    # and through the agent: sampling + energy with shared geometry match
    from genpose_tpu.config import Config
    from genpose_tpu.training.agent import PoseAgent

    cfg = Config(num_points=64, sampling_steps=3, eval_repeat_num=2)
    agent = PoseAgent(cfg, "score", steps_per_epoch=2)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    pts = jax.random.normal(k1, (2, 64, 3)) * 0.1
    batch = {"zero_mean_pts": pts - pts.mean(1, keepdims=True),
             "pts_center": pts.mean(1)}
    geom = agent.pts_geometry(batch["zero_mean_pts"])
    a = agent._sample_impl(agent.state, batch, k2, repeat_num=2,
                           sampler="ode", num_steps=3, T0=0.55)
    b = agent._sample_impl(agent.state, batch, k2, repeat_num=2,
                           sampler="ode", num_steps=3, T0=0.55, geometry=geom)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_geometry_indices_match_f32():
    """The bf16 geometry fast path (single-pass value gathers) must select
    the SAME indices as f32 — FPS and ball-query distance math stays f32 —
    and its grouped coords must equal the bf16 cast of the f32 grouped
    coords.  (On CPU the gather is exact, so the cast IS the only rounding;
    on TPU the single-pass gather additionally rounds the gathered operand,
    bounded by one bf16 ulp of |xyz|.)"""
    from genpose_tpu.models.pointnet2 import cls_msg_geometry

    key = jax.random.PRNGKey(5)
    pts = jax.random.normal(key, (3, 256, 3)) * 0.1
    g32 = jax.jit(lambda p: cls_msg_geometry(p, "light", jnp.float32))(pts)
    g16 = jax.jit(lambda p: cls_msg_geometry(p, "light", jnp.bfloat16))(pts)

    for s32, s16 in zip(g32, g16):
        if s32["new_xyz"] is not None:
            np.testing.assert_array_equal(np.asarray(s32["new_xyz"]),
                                          np.asarray(s16["new_xyz"]))
        for i32, i16, gx32, gx16 in zip(s32["gidx"], s16["gidx"],
                                        s32["grouped_xyz"],
                                        s16["grouped_xyz"]):
            assert gx16.dtype == jnp.bfloat16
            if i32 is not None:
                np.testing.assert_array_equal(np.asarray(i32),
                                              np.asarray(i16))
            # exact f32 difference, cast last (this test runs on CPU)
            np.testing.assert_array_equal(
                np.asarray(gx16, dtype=np.float32),
                np.asarray(gx32.astype(jnp.bfloat16), dtype=np.float32))


def test_pointnet2_batch_row_independence():
    """PointNet++ is NOT permutation-invariant (FPS seeds at index 0 and
    ball query keeps first-in-index-order members, like the CUDA reference)
    — the honest per-cloud property is batch-row independence: a cloud's
    global feature must not depend on its companions in the batch."""
    enc = Pointnet2ClsMSG(input_channels=0, config="light")
    key = jax.random.PRNGKey(4)
    pts = jax.random.normal(key, (3, 512, 3)) * 0.1
    variables = enc.init(key, pts, train=False)
    f_all = enc.apply(variables, pts, train=False)
    f_one = enc.apply(variables, pts[1:2], train=False)
    np.testing.assert_allclose(np.asarray(f_all[1:2]), np.asarray(f_one),
                               atol=1e-5, rtol=1e-5)


def test_pointnet_permutation_invariance():
    """The vanilla PointNet (per-point MLP + max pool, T-nets included) IS
    exactly permutation-invariant — pinned bit-exactly."""
    enc = PointNetfeat(in_dim=3, out_dim=256)
    key = jax.random.PRNGKey(6)
    pts = jax.random.normal(key, (2, 128, 3)) * 0.1
    variables = enc.init(key, pts)
    perm = jax.random.permutation(jax.random.PRNGKey(7), 128)
    f1 = enc.apply(variables, pts)
    f2 = enc.apply(variables, pts[:, perm])
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_pointnet_feat():
    enc = PointNetfeat(in_dim=3, out_dim=1024)
    key = jax.random.PRNGKey(5)
    pts = jax.random.normal(key, (2, 256, 3))
    variables = enc.init(key, pts)
    out = enc.apply(variables, pts)
    assert out.shape == (2, 1024)


def test_energynet_shapes_and_score_grad():
    net = PoseEnergyNet(marginal_prob_fn=SDE.marginal_prob)
    key = jax.random.PRNGKey(6)
    pts_feat = jax.random.normal(key, (4, 1024))
    pose = jax.random.normal(key, (4, 9))
    t = jnp.full((4, 1), 0.3)
    variables = net.init(key, pts_feat, pose, t)

    e = net.apply(variables, pts_feat, pose, t)  # decoupled IP
    assert e.shape == (4, 2)
    e_scalar = net.apply(variables, pts_feat, pose, t, decoupled_rt=False)
    assert e_scalar.shape == (4,)
    # decoupled energies sum to the scalar energy (IP mode)
    np.testing.assert_allclose(np.asarray(e.sum(-1)), np.asarray(e_scalar),
                               rtol=1e-5, atol=1e-6)


def test_gfobjectpose_score_mode():
    model = GFObjectPose(marginal_prob_fn=SDE.marginal_prob, posenet_mode="score")
    key = jax.random.PRNGKey(7)
    pts = jax.random.normal(key, (2, 256, 3)) * 0.1
    pose = jax.random.normal(key, (2, 9))
    t = jnp.full((2, 1), 0.5)
    variables = model.init(key, pts, pose, t, train=False)

    encode_fn = make_encode_fn(model, variables)
    score_fn = make_score_fn(model, variables)
    feat = encode_fn(pts)
    assert feat.shape == (2, 1024)
    s = score_fn(feat, pose, t)
    assert s.shape == (2, 9)


def test_gfobjectpose_energy_mode_score_is_grad():
    """Energy-model score == d(sum energy)/d(pose) (ref energynet.py:210-215)."""
    model = GFObjectPose(marginal_prob_fn=SDE.marginal_prob, posenet_mode="energy")
    key = jax.random.PRNGKey(8)
    pts = jax.random.normal(key, (2, 128, 3)) * 0.1
    pose = jax.random.normal(key, (2, 9))
    t = jnp.full((2, 1), 0.5)
    variables = model.init(key, pts, pose, t, train=False)

    encode_fn = make_encode_fn(model, variables)
    feat = encode_fn(pts)
    score_fn = make_score_fn(model, variables)
    energy_fn = make_energy_fn(model, variables, decoupled_rt=False)

    s = score_fn(feat, pose, t)
    assert s.shape == (2, 9)
    # finite-difference check on one coordinate
    h = 1e-3
    dp = jnp.zeros_like(pose).at[0, 2].set(h)
    e_plus = energy_fn(feat, pose + dp, t)
    e_minus = energy_fn(feat, pose - dp, t)
    fd = float((e_plus[0] - e_minus[0]) / (2 * h))
    assert abs(fd - float(s[0, 2])) < 2e-2 * max(1.0, abs(fd))


def test_pointnet2_seg_msg():
    """SA+FP segmentation encoder (ref pointnet2.py:92-163) produces
    per-point features + per-point logits."""
    from genpose_tpu.models.pointnet2 import Pointnet2MSG

    enc = Pointnet2MSG(input_channels=0)
    key = jax.random.PRNGKey(5)
    pts = jax.random.normal(key, (2, 512, 3)) * 0.1
    variables = enc.init(key, pts, train=False)
    per_point, logit = enc.apply(variables, pts, train=False)
    assert per_point.shape == (2, 512, 64)
    assert logit.shape == (2, 512, 1)
    assert np.isfinite(np.asarray(per_point)).all()


def test_pointnet2_cls_full_config():
    """5-stage ClsMSG_CFG variant (ref pointnet2.py:32-44)."""
    enc = Pointnet2ClsMSG(input_channels=0, config="full")
    key = jax.random.PRNGKey(6)
    pts = jax.random.normal(key, (2, 512, 3)) * 0.1
    variables = enc.init(key, pts, train=False)
    out = enc.apply(variables, pts, train=False)
    assert out.shape == (2, 1024)  # 512 + 512 concat
