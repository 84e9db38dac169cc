"""Checkpoint round-trip and resume tests (orbax)."""

import jax
import jax.numpy as jnp
import numpy as np

from genpose_tpu.config import Config
from genpose_tpu.training.agent import PoseAgent
from genpose_tpu.training.checkpoints import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)


def _cfg():
    return Config(num_points=32, repeat_num=1, sampling_steps=4,
                  pts_encoder="pointnet")


def _batch(cfg, key, bs=2):
    k1, k2 = jax.random.split(key)
    pts = jax.random.normal(k1, (bs, cfg.num_points, 3)) * 0.1
    gt = jax.random.normal(k2, (bs, 9))
    return {
        "zero_mean_pts": pts, "zero_mean_gt_pose": gt, "gt_pose": gt,
        "pts_center": jnp.zeros((bs, 3)),
        "id": jnp.zeros((bs,), jnp.int32),
        "handle_visibility": jnp.ones((bs,), jnp.int32),
    }


def test_checkpoint_roundtrip(tmp_path):
    cfg = _cfg()
    agent = PoseAgent(cfg, "score", steps_per_epoch=4)
    batch = _batch(cfg, jax.random.PRNGKey(0))
    agent.train_step(batch, jax.random.PRNGKey(1))
    agent.train_step(batch, jax.random.PRNGKey(2))

    path = save_checkpoint(str(tmp_path), agent.state, epoch=7,
                           clock={"epoch": 7, "minibatch": 0, "step": 2})
    assert latest_checkpoint(str(tmp_path)) == path

    # fresh agent restores everything (params, opt state, EMA, step)
    agent2 = PoseAgent(cfg, "score", steps_per_epoch=4, seed=123)
    state2 = load_checkpoint(path, agent2.state)
    assert int(state2.step) == 2
    for a, b in zip(jax.tree_util.tree_leaves(agent.state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(agent.state.ema.shadow),
                    jax.tree_util.tree_leaves(state2.ema.shadow)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state2.ema.num_updates) == 2

    # load_model_only keeps fresh optimizer state but takes params
    state3 = load_checkpoint(path, agent2.state, load_model_only=True)
    assert int(state3.step) == 0


def test_training_continues_after_restore(tmp_path):
    cfg = _cfg()
    agent = PoseAgent(cfg, "score", steps_per_epoch=4)
    batch = _batch(cfg, jax.random.PRNGKey(3))
    agent.train_step(batch, jax.random.PRNGKey(4))
    path = save_checkpoint(str(tmp_path), agent.state, epoch=1)

    agent2 = PoseAgent(cfg, "score", steps_per_epoch=4, seed=9)
    agent2.state = load_checkpoint(path, agent2.state)
    out = agent2.train_step(batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(out["gf"]))
    assert int(agent2.state.step) == 2
