"""bfloat16 compute-path validation (VERDICT r1 weak point 2).

``compute_dtype='bfloat16'`` is what ``bench.py`` runs on the real chip but
round 1 never tested its numerics.  These tests run the FULL pipeline
(encode -> K-hypothesis ODE sampling -> energy) in bf16 and f32 with
identical f32 params and pin the divergence:

- sampled rotations within a degree-scale budget, translations within a few
  percent (measured on an adversarial random net: 0.27deg mean / 0.6% rel);
- energies within a few percent;
- outputs (and therefore everything downstream: sigma-division inputs,
  quaternion averaging / eigh) stay float32 — params are f32 and only the
  matmul compute dtype drops to bf16.
"""

import jax
import jax.numpy as jnp
import numpy as np

from genpose_tpu.config import Config
from genpose_tpu.ops.pose import get_rot_matrix
from genpose_tpu.training.agent import PoseAgent


def _perturb(params, seed, scale=0.02):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef,
        [l + scale * jax.random.normal(k, l.shape)
         for l, k in zip(leaves, keys)])


def test_bf16_pipeline_close_to_f32():
    cfg32 = Config(num_points=128, batch_size=8, eval_repeat_num=4,
                   compute_dtype="float32")
    cfg16 = cfg32.replace(compute_dtype="bfloat16")
    a32 = PoseAgent(cfg32, "score")
    a16 = PoseAgent(cfg16, "score")
    # identical f32 params in both agents: only the compute dtype differs
    params = _perturb(a32.state.params, 7)
    for a in (a32, a16):
        a.state = a.state.replace(params=params,
                                  ema=a.state.ema.replace(shadow=params))
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(a16.state.params))

    key = jax.random.PRNGKey(0)
    batch = {
        "zero_mean_pts": jax.random.normal(key, (8, 128, 3)) * 0.1,
        "pts_center": jnp.zeros((8, 3)),
    }
    p32 = np.asarray(a32.sample(batch, jax.random.PRNGKey(1), repeat_num=4,
                                sampler="ode", num_steps=50))
    p16 = np.asarray(a16.sample(batch, jax.random.PRNGKey(1), repeat_num=4,
                                sampler="ode", num_steps=50))
    assert p16.dtype == np.float32  # integration state stays f32

    flat32, flat16 = p32.reshape(-1, 9), p16.reshape(-1, 9)
    R32 = np.asarray(get_rot_matrix(jnp.asarray(flat32[:, :6]), "rot_matrix"))
    R16 = np.asarray(get_rot_matrix(jnp.asarray(flat16[:, :6]), "rot_matrix"))
    tr = np.einsum("bij,bij->b", R32, R16)
    ang = np.degrees(np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0)))
    # measured on this seed: mean 0.27deg / max 1.03deg
    assert ang.mean() < 1.0 and ang.max() < 3.0, (ang.mean(), ang.max())

    scale = np.abs(p32[..., -3:]).mean()
    trans_rel = np.abs(p32[..., -3:] - p16[..., -3:]).max() / max(scale, 1e-9)
    assert trans_rel < 0.05, trans_rel  # measured 2.4%

    # energy path
    e32 = PoseAgent(cfg32, "energy")
    e16 = PoseAgent(cfg16, "energy")
    eparams = _perturb(e32.state.params, 9)
    e32.state = e32.state.replace(params=eparams)
    e16.state = e16.state.replace(params=eparams)
    en32 = np.asarray(e32.get_energy(batch, jnp.asarray(p32), T=1e-5))
    en16 = np.asarray(e16.get_energy(batch, jnp.asarray(p16), T=1e-5))
    rel = np.abs(en32 - en16).max() / max(np.abs(en32).max(), 1e-9)
    assert rel < 0.05, rel  # measured 0.65%


def test_bf16_train_step_finite_and_tracks_f32():
    """One bf16 DSM train step: finite loss, f32 params after update, and a
    loss value close to the f32 step's."""
    cfg32 = Config(num_points=64, repeat_num=4, batch_size=8,
                   compute_dtype="float32")
    cfg16 = cfg32.replace(compute_dtype="bfloat16")
    a32 = PoseAgent(cfg32, "score", steps_per_epoch=10)
    a16 = PoseAgent(cfg16, "score", steps_per_epoch=10)
    params = _perturb(a32.state.params, 11)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    for a in (a32, a16):
        # independent copies: train_step donates the state buffers
        a.state = a.state.replace(params=copy(params),
                                  ema=a.state.ema.replace(shadow=copy(params)))

    key = jax.random.PRNGKey(2)
    batch = {
        "zero_mean_pts": jax.random.normal(key, (8, 64, 3)) * 0.1,
        "zero_mean_gt_pose": jax.random.normal(key, (8, 9)),
        "pts_center": jnp.zeros((8, 3)),
    }
    l32 = float(a32.train_step(batch, jax.random.PRNGKey(3))["gf"])
    l16 = float(a16.train_step(batch, jax.random.PRNGKey(3))["gf"])
    assert np.isfinite(l16)
    assert abs(l16 - l32) / max(abs(l32), 1e-9) < 0.05, (l32, l16)
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(a16.state.params))


def test_head_dtype_float32_hybrid_mode():
    """cfg.head_dtype='float32' (bf16 encoder, f32 heads): same param
    template as full-bf16, head outputs computed in f32 (bit-identical to
    an f32 head on the same feature), and a finite train step.  NOTE: this
    knob does NOT make bf16 training converge at full model size
    (BASELINE.md r3) — it pins the mechanics, not a supported mode."""
    cfg_hy = Config(num_points=64, repeat_num=4, batch_size=8,
                    compute_dtype="bfloat16", head_dtype="float32")
    cfg16 = cfg_hy.replace(head_dtype="compute")
    a_hy = PoseAgent(cfg_hy, "score", steps_per_epoch=10)
    a16 = PoseAgent(cfg16, "score", steps_per_epoch=10)
    # identical template: head_dtype changes compute, never params
    t_hy = jax.tree_util.tree_structure(a_hy.state.params)
    t_16 = jax.tree_util.tree_structure(a16.state.params)
    assert t_hy == t_16

    params = _perturb(a_hy.state.params, 13)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    for a in (a_hy, a16):
        a.state = a.state.replace(params=copy(params),
                                  ema=a.state.ema.replace(shadow=copy(params)))

    # head computes in f32: feeding the SAME feature must reproduce the
    # f32-head score exactly, where the bf16 head only tracks approximately
    feat = jax.random.normal(jax.random.PRNGKey(5), (8, 1024))
    pose = jax.random.normal(jax.random.PRNGKey(6), (8, 9))
    t = jnp.full((8, 1), 0.5)
    s_hy = a_hy.model.apply(
        {"params": params, "batch_stats": a_hy.state.batch_stats},
        feat, pose, t, method="score")
    a32 = PoseAgent(Config(num_points=64, repeat_num=4, batch_size=8), "score",
                    steps_per_epoch=10)
    s_32 = a32.model.apply(
        {"params": params, "batch_stats": a32.state.batch_stats},
        feat, pose, t, method="score")
    np.testing.assert_array_equal(np.asarray(s_hy), np.asarray(s_32))

    key = jax.random.PRNGKey(2)
    batch = {
        "zero_mean_pts": jax.random.normal(key, (8, 64, 3)) * 0.1,
        "zero_mean_gt_pose": jax.random.normal(key, (8, 9)),
        "pts_center": jnp.zeros((8, 3)),
    }
    l_hy = float(a_hy.train_step(batch, jax.random.PRNGKey(3))["gf"])
    assert np.isfinite(l_hy)
