"""Production inference pipeline: one compiled dispatch per request batch.

The reference has no serving story (its eval scripts round-trip scipy per
ODE step); this is the deployment-facing API of the TPU framework. The full
chain — zero-center -> K-hypothesis PF-ODE sampling -> energy scoring ->
decoupled rot/trans ranking -> top-ratio quaternion-average pooling
(``evaluation_single.py:356-489`` semantics) — is compiled into a single
XLA program with static shapes; requests smaller than the compiled batch
are padded, larger ones are chunked.

Usage:
    pipe = InferencePipeline(cfg, score_ckpt_dir, energy_ckpt_dir)
    out = pipe.predict(pts)       # pts: [n, num_points, 3] float32 (meters)
    out["pred_pose"]              # [n, 7]  wxyz quaternion + translation
    out["sorted_hypotheses"]      # [n, K, pose_dim], best-energy first
    out["energy"]                 # [n, K, 2]
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from genpose_tpu.config import Config, enable_compile_cache
from genpose_tpu.training.agent import PoseAgent
from genpose_tpu.training.checkpoints import load_checkpoint
from genpose_tpu.training.ranking import sort_poses_by_energy


class InferencePipeline:
    """Load-once, dispatch-once pose estimation service."""

    def __init__(
        self,
        cfg: Config,
        score_ckpt: Optional[str] = None,
        energy_ckpt: Optional[str] = None,
        batch_size: Optional[int] = None,
        mesh=None,
    ):
        self.cfg = cfg
        enable_compile_cache(cfg)
        self.bs = batch_size or cfg.batch_size
        self.K = cfg.eval_repeat_num
        self.keep = max(1, int(cfg.ratio * self.K))
        self.mesh = mesh

        # the agents are built WITH the mesh, so checkpoint restore keeps
        # their replicated placement — load_checkpoint restores with the
        # template state's sharding
        # (tests/test_checkpoint.py::test_restore_preserves_mesh_sharding)
        self.score_agent = PoseAgent(cfg, "score", mesh=mesh)
        self.energy_agent = PoseAgent(cfg, "energy", mesh=mesh)
        if score_ckpt:
            self.score_agent.state = load_checkpoint(
                score_ckpt, self.score_agent.state, load_model_only=True)
        if energy_ckpt:
            self.energy_agent.state = load_checkpoint(
                energy_ckpt, self.energy_agent.state, load_model_only=True)

        K, keep, steps, T0 = (self.K, self.keep, cfg.sampling_steps, cfg.T0)
        sampler = cfg.sampler_mode[0] if cfg.sampler_mode else "ode"
        score_agent, energy_agent = self.score_agent, self.energy_agent

        @jax.jit
        def _run(score_state, energy_state, pts, key):
            center = jnp.mean(pts[:, :, :3], axis=1)
            batch = {
                "zero_mean_pts": pts.at[:, :, :3].add(-center[:, None, :]),
                "pts_center": center,
            }
            # FPS/ball-query/grouping geometry is weight-independent: compute
            # it once and share it between the score and energy encoders
            geom = score_agent.pts_geometry(batch["zero_mean_pts"])
            pred = score_agent._sample_impl(
                score_state, batch, key, repeat_num=K, sampler=sampler,
                num_steps=steps, T0=T0, geometry=geom)
            t_in = jnp.full((pts.shape[0], K), 1e-5)
            energy = energy_agent._get_energy_impl(
                energy_state, batch, pred, t_in, geometry=geom)
            sorted_pose, sorted_energy = sort_poses_by_energy(pred, energy)
            pred_q, avg = score_agent.aggregate_hypotheses(
                sorted_pose[:, :keep])
            best = pred_q[:, 0]
            return {
                "pred_pose": avg,                # [n, 7] wxyz + t (pooled)
                "best_pose": best,               # [n, 7] best-energy
                "sorted_hypotheses": sorted_pose,  # [n, K, pose_dim]
                "energy": sorted_energy,         # [n, K, 2]
            }

        self._run = _run
        self._run_frozen = None

    def freeze(self):
        """Bake the CURRENT weights into the compiled program as constants.

        Serving weights are fixed at deployment, so the states can be closed
        over instead of passed as arguments, letting XLA treat them as
        compile-time constants.  Measured on 1x v5e at bs=64/K=50
        (same-session A/B, distinct-seed agents, round 4): within noise —
        +0.14% adaptive RK45, +0.83% Heun-500 (XLA lowers loop-invariant
        weight ARGUMENTS essentially as well; bench_evidence/onchip_r4/
        freeze_ab_*.jsonl, BASELINE.md r4).  Kept: never slower, and the
        frozen call path skips re-marshaling the two state pytrees on every
        dispatch.
        Outputs are NOT bit-identical to the argument-passing path (XLA may
        refuse/reorder fusions differently) but are the same computation.

        Re-call after swapping checkpoints; ``predict`` uses the frozen
        program only while the agents still hold the states it captured.
        """
        ss, es = self.score_agent.state, self.energy_agent.state
        run = self._run

        @jax.jit
        def _run_frozen(pts, key):
            return run(ss, es, pts, key)

        self._run_frozen = _run_frozen
        self._frozen_states = (ss, es)
        return self

    def _dispatch(self, pts, key):
        if (self._run_frozen is not None
                and self._frozen_states[0] is self.score_agent.state
                and self._frozen_states[1] is self.energy_agent.state):
            return self._run_frozen(pts, key)
        return self._run(self.score_agent.state, self.energy_agent.state,
                         pts, key)

    def warmup(self, key=None):
        """Compile with dummy data (first real request then runs hot)."""
        pts = jnp.zeros((self.bs, self.cfg.num_points, 3), jnp.float32)
        out = self._dispatch(pts,
                             key if key is not None else jax.random.PRNGKey(0))
        jax.block_until_ready(out)
        return self

    def predict(self, pts, key=None) -> Dict[str, np.ndarray]:
        """pts: [n, num_points, 3] camera-frame meters -> result dict.

        n may be anything: short batches are padded to the compiled size,
        long ones chunked.  Deterministic per (pts, key).
        """
        pts = np.asarray(pts, np.float32)
        n = pts.shape[0]
        if n == 0:
            d = self.score_agent.pose_dim
            return {
                "pred_pose": np.zeros((0, 7), np.float32),
                "best_pose": np.zeros((0, 7), np.float32),
                "sorted_hypotheses": np.zeros((0, self.K, d), np.float32),
                "energy": np.zeros((0, self.K, 2), np.float32),
            }
        key = key if key is not None else jax.random.PRNGKey(0)

        # Dispatch every chunk before fetching any result: jax dispatch is
        # async, so the device pipelines chunk i+1's H2D copy and compute
        # behind chunk i's, and the blocking device_get transfers drain an
        # already-full queue instead of serializing (copy -> compute ->
        # fetch) per chunk.
        pending = []
        for lo in range(0, n, self.bs):
            chunk = pts[lo:lo + self.bs]
            pad = self.bs - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad, axis=0)], axis=0)
            if self.mesh is not None:
                from genpose_tpu.parallel.mesh import shard_batch

                chunk = shard_batch(self.mesh, {"pts": jnp.asarray(chunk)})["pts"]
            key, k = jax.random.split(key)
            pending.append((self._dispatch(jnp.asarray(chunk), k), pad))

        outs = []
        for out, pad in pending:
            # one device_get per chunk tree: a single host transfer instead
            # of one round-trip per output array
            out = jax.device_get(out)
            outs.append({kk: v[:self.bs - pad or None]
                         for kk, v in out.items()})
        return {kk: np.concatenate([o[kk] for o in outs], axis=0)
                for kk in outs[0]}
