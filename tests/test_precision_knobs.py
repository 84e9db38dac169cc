"""Tests for the round-4 mixed-precision decomposition knobs
(``bn_dtype``, ``geometry_dtype`` — VERDICT r3 #2).

The knobs exist to bisect WHERE bf16 training loses the rotation signal
(BASELINE.md r3: all-bf16 and bf16+f32-heads both stall rotation at full
model size), so the contracts pinned here are:

- both knobs are exact NO-OPS under f32 compute (the supported training
  default cannot drift);
- ``geometry_dtype=float32`` under bf16 compute produces f32 exact grouped
  coordinates (the gathers run the bit-exact HIGHEST lowering), and the
  precomputed-geometry sharing invariant still holds bit-exactly;
- ``bn_dtype=float32`` under bf16 compute keeps every BatchNorm output the
  f32 normalization of its input (statistics not bf16-rounded);
- the CLI accepts the knobs and rejects typos (the r3 lesson: a silently
  ignored precision flag invalidates an experiment).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genpose_tpu.config import Config, get_config
from genpose_tpu.training.agent import PoseAgent


def _batch(key, bs=4, n=96):
    k1, k2 = jax.random.split(key)
    pts = jax.random.normal(k1, (bs, n, 3)) * 0.1
    gt = jax.random.normal(k2, (bs, 9)) * 0.3
    return {
        "zero_mean_pts": pts - pts.mean(axis=1, keepdims=True),
        "zero_mean_gt_pose": gt,
        "pts_center": pts.mean(axis=1),
    }


def test_knobs_are_noops_in_f32():
    """Under float32 compute the knobs must not change a single bit of the
    train step or the sampler (the supported default is f32 training)."""
    base = Config(num_points=96, repeat_num=2, batch_size=4, sampling_steps=3)
    batch = _batch(jax.random.PRNGKey(0))
    outs = []
    for kw in ({}, {"bn_dtype": "float32", "geometry_dtype": "float32"}):
        agent = PoseAgent(base.replace(**kw), "score", steps_per_epoch=4)
        loss = agent.train_step(batch, jax.random.PRNGKey(1))
        pred = agent.sample(batch, jax.random.PRNGKey(2), repeat_num=2,
                            sampler="ode", num_steps=3)
        outs.append((float(loss["gf"]), np.asarray(pred)))
    assert outs[0][0] == outs[1][0]
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


def test_geometry_dtype_f32_under_bf16():
    """geometry_dtype=float32 + bf16 compute: the grouped coordinates stay
    exact f32 (bit-equal to the all-f32 geometry) and the shared-geometry
    path is bit-identical to the inline path."""
    from genpose_tpu.models.pointnet2 import cls_msg_geometry
    from genpose_tpu.models.posenet import GFObjectPose

    cfg = Config(num_points=96, batch_size=4, compute_dtype="bfloat16",
                 geometry_dtype="float32")
    agent = PoseAgent(cfg, "score", steps_per_epoch=4)
    batch = _batch(jax.random.PRNGKey(3))
    pts = batch["zero_mean_pts"]

    geom = agent.pts_geometry(pts)
    g32 = jax.jit(lambda p: cls_msg_geometry(p, "light", jnp.float32))(pts)
    for ga, gb in zip(geom, g32):
        for a, b in zip(ga["grouped_xyz"], gb["grouped_xyz"]):
            assert a.dtype == jnp.float32
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    variables = {"params": agent.state.params,
                 "batch_stats": agent.state.batch_stats}
    f_inline = agent.model.apply(variables, pts, train=False,
                                 method=GFObjectPose.encode_pts)
    f_shared = agent.model.apply(variables, pts, train=False, geometry=geom,
                                 method=GFObjectPose.encode_pts)
    assert f_inline.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(f_inline), np.asarray(f_shared))


def test_bn_dtype_f32_under_bf16_trains():
    """bn_dtype=float32 + bf16 compute: the train step runs, losses are
    finite, and the running batch statistics stay f32."""
    cfg = Config(num_points=96, repeat_num=2, batch_size=4,
                 compute_dtype="bfloat16", bn_dtype="float32")
    agent = PoseAgent(cfg, "score", steps_per_epoch=4)
    batch = _batch(jax.random.PRNGKey(4))
    loss = agent.train_step(batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(loss["gf"]))
    for leaf in jax.tree.leaves(agent.state.batch_stats):
        assert leaf.dtype == jnp.float32


def test_bn_dtype_f32_is_bit_identical_on_this_flax():
    """FINDING (round 4, pinned here so a flax upgrade that changes it is
    caught): flax's ``nn.BatchNorm(dtype=bfloat16)`` already computes the
    statistics AND the normalization arithmetic in f32 and only casts the
    OUTPUT to bf16, so ``bn_dtype=float32`` (f32 BN + final cast to bf16)
    is bit-identical to the default bf16 BN.  Consequence for the bf16
    mixed-precision training sweep (VERDICT r3 #2): BatchNorm precision is
    EXCLUDED as the cause of the r3 bf16 rotation-learning failure by
    construction — the bisection is geometry rounding vs the bf16 matmuls.
    The knob stays as insurance against flax changing this behavior.
    (Round 5: SharedMLP's BN is now TorchBatchNorm, which reuses flax's
    f32 _compute_stats/_normalize — the f32-statistics finding carries
    over; only the running_var increment changed, to torch's unbiased
    semantics, asserted below.)"""
    from genpose_tpu.models.layers import SharedMLP

    x = (jax.random.normal(jax.random.PRNGKey(6), (2, 8, 4, 16)) * 3
         ).astype(jnp.bfloat16)
    mlp16 = SharedMLP((32,), dtype=jnp.bfloat16)
    mlp32 = SharedMLP((32,), dtype=jnp.bfloat16, bn_dtype=jnp.float32)
    v = mlp16.init(jax.random.PRNGKey(7), x, train=True)

    def run(m):
        y, mut = m.apply(v, x, train=True, mutable=["batch_stats"])
        return np.asarray(y, np.float32), mut["batch_stats"]

    y16, st16 = run(mlp16)
    y32, st32 = run(mlp32)
    np.testing.assert_array_equal(y16, y32)
    for a, b in zip(jax.tree.leaves(st16), jax.tree.leaves(st32)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # f32-BN running stats equal the exact f32 statistics of the BN input
    # (the bf16 Dense output, reproduced with the same bf16 matmul); the
    # running_var increment is the UNBIASED variance — torch semantics,
    # round-5 TorchBatchNorm (layers.py), pinned against the running torch
    # reference by tests/test_training_parity.py
    kern = v["params"]["dense_0"]["kernel"].astype(jnp.bfloat16)
    h = np.asarray(x @ kern, np.float32)
    mean = h.mean(axis=(0, 1, 2))
    n = h.shape[0] * h.shape[1] * h.shape[2]
    var_unbiased = h.var(axis=(0, 1, 2)) * n / (n - 1)
    got = st32["bn_0"]
    np.testing.assert_allclose(np.asarray(got["mean"]), 0.1 * mean,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got["var"]),
                               0.9 * 1.0 + 0.1 * var_unbiased,
                               rtol=1e-5, atol=1e-6)


def test_encoder_f32_stages_under_bf16():
    """encoder_f32_stages=2 + bf16 compute: the first two SA stages run f32
    (f32 grouped geometry), the rest bf16; the shared-geometry invariant
    holds bit-exactly; and under f32 compute the knob is a no-op."""
    from genpose_tpu.models.posenet import GFObjectPose

    base = Config(num_points=96, repeat_num=2, batch_size=4)
    batch = _batch(jax.random.PRNGKey(8))
    pts = batch["zero_mean_pts"]

    # f32: no-op (zero-init heads make the DSM loss encoder-independent, so
    # compare the ENCODER features, the strongest invariant)
    f_feats = []
    for k in (0, 2):
        agent = PoseAgent(base.replace(encoder_f32_stages=k), "score",
                          steps_per_epoch=4)
        v = {"params": agent.state.params,
             "batch_stats": agent.state.batch_stats}
        f_feats.append(np.asarray(agent.model.apply(
            v, pts, train=False, method=GFObjectPose.encode_pts)))
    np.testing.assert_array_equal(f_feats[0], f_feats[1])

    # bf16 + f32_stages=2
    cfg = base.replace(compute_dtype="bfloat16", encoder_f32_stages=2)
    agent = PoseAgent(cfg, "score", steps_per_epoch=4)
    geom = agent.pts_geometry(pts)
    assert geom[0]["grouped_xyz"][0].dtype == jnp.float32
    assert geom[1]["grouped_xyz"][0].dtype == jnp.float32
    assert geom[2]["grouped_xyz"][0].dtype == jnp.bfloat16
    v = {"params": agent.state.params,
         "batch_stats": agent.state.batch_stats}
    fi = agent.model.apply(v, pts, train=False,
                           method=GFObjectPose.encode_pts)
    fs = agent.model.apply(v, pts, train=False, geometry=geom,
                           method=GFObjectPose.encode_pts)
    np.testing.assert_array_equal(np.asarray(fi, np.float32),
                                  np.asarray(fs, np.float32))
    loss = agent.train_step(batch, jax.random.PRNGKey(9))
    assert np.isfinite(float(loss["gf"]))


def test_encoder_f32_stages_negative_is_suffix():
    """encoder_f32_stages=-1 + bf16 compute: ONLY the final GroupAll stage
    runs f32 (the round-4 bisection probe; -2 is the supported mixed config —
    -1 alone leaves rotation learning at ~half rate, BASELINE.md r4); the
    shared-geometry invariant holds bit-exactly; f32 compute stays a no-op."""
    from genpose_tpu.models.pointnet2 import stage_is_f32
    from genpose_tpu.models.posenet import GFObjectPose

    assert [stage_is_f32(k, 4, -1) for k in range(4)] == [False] * 3 + [True]
    assert [stage_is_f32(k, 4, 2) for k in range(4)] == [True, True,
                                                        False, False]

    base = Config(num_points=96, repeat_num=2, batch_size=4)
    batch = _batch(jax.random.PRNGKey(10))
    pts = batch["zero_mean_pts"]

    # f32 compute: exact no-op on the encoder features
    feats = []
    for k in (0, -1):
        agent = PoseAgent(base.replace(encoder_f32_stages=k), "score",
                          steps_per_epoch=4)
        v = {"params": agent.state.params,
             "batch_stats": agent.state.batch_stats}
        feats.append(np.asarray(agent.model.apply(
            v, pts, train=False, method=GFObjectPose.encode_pts)))
    np.testing.assert_array_equal(feats[0], feats[1])

    # bf16 + suffix -1: early-stage geometry bf16, GroupAll-stage f32
    cfg = base.replace(compute_dtype="bfloat16", encoder_f32_stages=-1)
    agent = PoseAgent(cfg, "score", steps_per_epoch=4)
    geom = agent.pts_geometry(pts)
    assert geom[0]["grouped_xyz"][0].dtype == jnp.bfloat16
    assert geom[-1]["grouped_xyz"][0].dtype == jnp.float32
    v = {"params": agent.state.params,
         "batch_stats": agent.state.batch_stats}
    fi = agent.model.apply(v, pts, train=False,
                           method=GFObjectPose.encode_pts)
    fs = agent.model.apply(v, pts, train=False, geometry=geom,
                           method=GFObjectPose.encode_pts)
    np.testing.assert_array_equal(np.asarray(fi, np.float32),
                                  np.asarray(fs, np.float32))
    loss = agent.train_step(batch, jax.random.PRNGKey(11))
    assert np.isfinite(float(loss["gf"]))


def test_cli_accepts_and_validates_knobs():
    cfg = get_config(["--bn_dtype", "float32", "--geometry_dtype", "float32",
                      "--encoder_f32_stages", "2"])
    assert cfg.bn_dtype == "float32" and cfg.geometry_dtype == "float32"
    assert cfg.encoder_f32_stages == 2
    # argparse negative-number handling: the supported mixed config (-2) and
    # the bisection probe (-1) must survive CLI parsing
    assert get_config(["--encoder_f32_stages", "-2"]).encoder_f32_stages == -2
    assert get_config(["--encoder_f32_stages", "-1"]).encoder_f32_stages == -1
    with pytest.raises(ValueError):
        Config(bn_dtype="fp32")
    with pytest.raises(ValueError):
        Config(geometry_dtype="bf16")
    with pytest.raises(ValueError):
        Config(encoder_f32_stages=9)
