"""On-chip training convergence check: train the full-size score net on a
synthetic 4-object task on the real TPU and verify DSM loss and sampled pose
error drop; mirrors tests/test_convergence.py (which runs a tiny net on CPU)
at production model size on hardware.

Measured (1x v5e, 2026-08-17): 3000 steps of bs=64/repeat=20 in 230 s
(835 samples/s); DSM 9.0 -> 1.4, sampled rotation error 124 -> 33 deg,
translation error 77 m (VE prior scale) -> 0.29 m.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from genpose_tpu.config import Config
from genpose_tpu.ops.pose import get_rot_matrix
from genpose_tpu.training.agent import PoseAgent

BS = int(os.environ.get("TRAIN_BATCH", "64"))
N_STEPS = int(os.environ.get("N_STEPS", "3000"))
# LR defaults to 1e-3 (every arm before round 5 ran this); override for the
# lr-scaled big-batch convergence arm (VERDICT r4 #4: bs=384 at sqrt- or
# linear-scaled lr iff profile_train shows a per-sample win at bs>192).
LR = float(os.environ.get("LR", "1e-3"))
rng = np.random.default_rng(0)

# fixed library of 4 clouds with known poses; each batch draws poses anew
clouds = jnp.asarray(rng.normal(size=(4, 1024, 3)).astype(np.float32) * 0.1)

cfg = Config(num_points=1024, repeat_num=20, batch_size=BS, lr=LR,
             warmup=100,
             compute_dtype=os.environ.get("TRAIN_DTYPE", "float32"),
             head_dtype=os.environ.get("HEAD_DTYPE", "compute"),
             bn_dtype=os.environ.get("BN_DTYPE", "compute"),
             geometry_dtype=os.environ.get("GEOM_DTYPE", "compute"),
             encoder_f32_stages=int(os.environ.get("F32_STAGES", "0")),
             gather_grad=os.environ.get("GATHER_GRAD", "exact"),
             gather_fwd=os.environ.get("GATHER_FWD", "exact"))
print(f"config: bs={BS} lr={LR:g} "
      f"compute={cfg.compute_dtype} head={cfg.head_dtype} "
      f"bn={cfg.bn_dtype} geom={cfg.geometry_dtype} "
      f"f32_stages={cfg.encoder_f32_stages} "
      f"gathers={cfg.gather_fwd}/{cfg.gather_grad}", flush=True)
agent = PoseAgent(cfg, "score", steps_per_epoch=100)


def make_batch(key):
    k1, k2, k3 = jax.random.split(key, 3)
    which = jax.random.randint(k1, (BS,), 0, 4)
    # random rotation via QR of gaussians; translation in [-0.2, 0.2]
    g = jax.random.normal(k2, (BS, 3, 3))
    q, r = jnp.linalg.qr(g)
    q = q * jnp.sign(jnp.diagonal(r, axis1=-2, axis2=-1))[:, None, :]
    det = jnp.linalg.det(q)
    q = q.at[:, :, 0].multiply(jnp.sign(det)[:, None])
    t = jax.random.uniform(k3, (BS, 3), minval=-0.2, maxval=0.2)
    pts = jnp.einsum("bij,bnj->bni", q, clouds[which]) + t[:, None, :]
    center = pts.mean(axis=1)
    # 6D pose = first two COLUMNS of R (transposed convention)
    pose6 = jnp.concatenate([q[:, :, 0], q[:, :, 1]], axis=-1)
    gt = jnp.concatenate([pose6, t], axis=-1)
    return {
        "zero_mean_pts": pts - center[:, None, :],
        "zero_mean_gt_pose": gt.at[:, -3:].add(-center),
        "pts_center": center,
    }, gt


def rot_err_deg(pred, gt):
    Rp = np.asarray(get_rot_matrix(jnp.asarray(pred[:, :6]), "rot_matrix"))
    Rg = np.asarray(get_rot_matrix(jnp.asarray(gt[:, :6]), "rot_matrix"))
    tr = np.einsum("bij,bij->b", Rp, Rg)
    return np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))


def eval_sampled(tag):
    key = jax.random.PRNGKey(999)
    batch, gt = make_batch(key)
    pred = agent.sample(batch, jax.random.PRNGKey(1000), repeat_num=1,
                        sampler="ode", num_steps=100)
    pred = np.asarray(pred)[:, 0]
    gt = np.asarray(gt)
    re = rot_err_deg(pred, gt)
    te = np.linalg.norm(pred[:, -3:] - gt[:, -3:], axis=-1)
    print(f"{tag}: rot_err {re.mean():.1f} deg  trans_err {te.mean()*100:.1f} cm",
          flush=True)
    return re.mean(), te.mean()

re0, te0 = eval_sampled("init")
key = jax.random.PRNGKey(7)

# CRITERION mode (round-5 verdict #5: settle precision configs by
# WALL-CLOCK-TO-CRITERION, not fixed-step-count comparisons): evaluate every
# $EVAL_EVERY steps and report the first time rot < $ROT_CRIT deg AND
# trans < $TRANS_CRIT cm; wall-clock excludes the eval pauses (training
# compute only — what a real run pays).  0 disables (default: the original
# fixed-N_STEPS convergence check).
EVAL_EVERY = int(os.environ.get("EVAL_EVERY", "0"))
ROT_CRIT = float(os.environ.get("ROT_CRIT", "41.0"))
TRANS_CRIT = float(os.environ.get("TRANS_CRIT", "3.9"))

t0 = time.perf_counter()
eval_time = 0.0
first = last = None
met_at = None
for i in range(N_STEPS):
    key, kb, kl = jax.random.split(key, 3)
    batch, _ = make_batch(kb)
    losses = agent.train_step(batch, kl)
    if i == 0:
        # exclude the first step (XLA compile, cache-state dependent —
        # minutes over the tunnel when cold, ~0 when cached) from the
        # wall-clock: cross-config criterion comparisons must not depend
        # on which config happened to be compiled in a previous session.
        jax.block_until_ready(losses["gf"])
        compile_s = time.perf_counter() - t0
        print(f"first step (compile, excluded): {compile_s:.0f}s", flush=True)
        t0 = time.perf_counter()
        first = float(losses["gf"])
    if i % 100 == 0:
        print(f"step {i}: dsm {float(losses['gf']):.1f}", flush=True)
    if EVAL_EVERY and (i + 1) % EVAL_EVERY == 0:
        te_start = time.perf_counter()
        re_i, te_i = eval_sampled(f"eval@{i + 1}")
        eval_time += time.perf_counter() - te_start
        train_wall = time.perf_counter() - t0 - eval_time
        print(f"criterion check @{i + 1}: rot {re_i:.1f} deg "
              f"trans {te_i * 100:.1f} cm  train_wall {train_wall:.0f}s",
              flush=True)
        if re_i < ROT_CRIT and te_i * 100 < TRANS_CRIT:
            met_at = (i + 1, train_wall)
            print(f"CRITERION MET at step {i + 1}: {train_wall:.0f}s "
                  f"training wall-clock (rot {re_i:.1f} < {ROT_CRIT}, "
                  f"trans {te_i * 100:.1f} < {TRANS_CRIT} cm)", flush=True)
            break
last = float(losses["gf"])
dt = time.perf_counter() - t0 - eval_time
steps_run = met_at[0] if met_at else N_STEPS
print(f"{steps_run} steps in {dt:.0f}s ({steps_run * BS / dt:.0f} samples/s)")
if EVAL_EVERY:
    if met_at is None:
        print(f"CRITERION NOT MET within {N_STEPS} steps ({dt:.0f}s)")
    raise SystemExit(0)
re1, te1 = eval_sampled("trained")
print(f"dsm {first:.1f} -> {last:.1f}; rot {re0:.1f} -> {re1:.1f} deg; "
      f"trans {te0*100:.1f} -> {te1*100:.1f} cm")
assert last < first / 2, (first, last)
assert re1 < re0 / 3 and te1 < te0 / 20, (re0, re1, te0, te1)
print("CONVERGED OK")
