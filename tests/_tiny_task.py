"""Shared tiny synthetic-task scaffolding for the convergence and EDM
suites (one copy so the two suites cannot measure subtly different tasks).
"""

import jax
import jax.numpy as jnp

from genpose_tpu.ops.pose import get_rot_matrix

N_OBJ = 2
BS = 16
N_PTS = 32


def make_task(seed: int = 0):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    base = jax.random.normal(k1, (N_OBJ, N_PTS, 3)) * 0.1
    gt_pose = jax.random.normal(k2, (N_OBJ, 9))
    gt_pose = gt_pose.at[:, -3:].multiply(0.05)
    return base, gt_pose


def make_batch(task, key):
    base, gt_pose = task
    idx = jax.random.randint(key, (BS,), 0, N_OBJ)
    batch = {
        "zero_mean_pts": base[idx],
        "zero_mean_gt_pose": gt_pose[idx],
        "gt_pose": gt_pose[idx],
        "pts_center": jnp.zeros((BS, 3)),
        "id": jnp.zeros((BS,), jnp.int32),
        "handle_visibility": jnp.ones((BS,), jnp.int32),
    }
    return batch, idx


def rot_err_deg(pred, gt):
    R1 = get_rot_matrix(pred[:, :-3], "rot_matrix")
    R2 = get_rot_matrix(gt[:, :-3], "rot_matrix")
    tr = jnp.einsum("bij,bij->b", R1, R2)
    return jnp.degrees(jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)))


def sample_errors(agent, task, sampler="ode", num_steps=50, **kw):
    base, gt_pose = task
    batch, idx = make_batch(task, jax.random.PRNGKey(999))
    pred = agent.sample(batch, jax.random.PRNGKey(5), repeat_num=1,
                        sampler=sampler, num_steps=num_steps, **kw)[:, 0]
    gt = gt_pose[idx]
    rot = float(rot_err_deg(pred, gt).mean())
    trans = float(jnp.linalg.norm(pred[:, -3:] - gt[:, -3:], axis=-1).mean())
    return rot, trans
