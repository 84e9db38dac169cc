"""PoseAgent: the training / inference orchestrator.

Functional re-design of reference ``networks/posenet_agent.py:46-623``.
Every hot path is ONE jitted function:

- :meth:`train_step` (score): encoder once per batch + ``repeat_num``
  vectorized DSM draws + adam/EMA update — the reference runs the x20 loss
  loop sequentially (``posenet_agent.py:185-195``);
- :meth:`train_step_energy`: DSM (score = grad energy) + ranking loss whose
  GT pose errors are computed ON DEVICE (``pose_errors_jax``) instead of the
  reference's numpy round-trip (``posenet_agent.py:240-256``);
- :meth:`sample`: K hypotheses folded into the batch axis
  (bs->bs*K, ref ``posenet_agent.py:426-438``) and integrated by the
  ``lax.scan`` ODE/PC sampler — zero host round-trips;
- :meth:`get_energy`: candidate energies at t~U{1e-5..9e-5} (train) or
  fixed T (test) with centers subtracted (ref ``posenet_agent.py:471-527``).

Under a mesh, batch tensors are sharded over ``dp`` and params replicated;
jit inserts the gradient psum over ICI (see ``parallel/mesh.py``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from genpose_tpu.config import Config
from genpose_tpu.diffusion.losses import dsm_loss_repeated, edm_dsm_loss_repeated
from genpose_tpu.diffusion.samplers import (
    edm_sampler,
    ode_likelihood,
    ode_sampler,
    ode_sampler_adaptive,
    pc_sampler,
)
from genpose_tpu.diffusion.sde import init_sde
from genpose_tpu.eval.metrics import pose_errors_jax
from genpose_tpu.models.posenet import GFObjectPose
from genpose_tpu.ops.pose import (
    average_quaternion_batch,
    get_pose_dim,
    get_rot_matrix,
    matrix_to_quat_wxyz,
)
from genpose_tpu.training.ranking import ranking_loss, sort_results
from genpose_tpu.training.state import TrainState, create_train_state


class PoseAgent:
    """Builds the model + state and exposes jitted step functions."""

    def __init__(
        self,
        cfg: Config,
        posenet_mode: Optional[str] = None,
        steps_per_epoch: int = 1000,
        mesh=None,
        seed: Optional[int] = None,
    ):
        self.cfg = cfg
        self.mode = posenet_mode or cfg.posenet_mode
        self.sde = init_sde(cfg.sde_mode)
        self.mesh = mesh
        self.pose_dim = get_pose_dim(cfg.pose_mode)
        # EDM generative path (ref ``posenet_agent.py:70-71`` selects
        # loss_fn_edm; the decoder head the reference sketches at
        # ``posenet.py:49-56`` is wired for real here): score agents get a
        # PoseDecoderNet head trained with the EDM loss; energy agents keep
        # their energy head and derive the denoiser from its autograd score.
        self.is_edm = cfg.sde_mode == "edm"

        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        head_dtype = jnp.float32 if cfg.head_dtype == "float32" else None
        bn_dtype = jnp.float32 if cfg.bn_dtype == "float32" else None
        geometry_dtype = jnp.float32 if cfg.geometry_dtype == "float32" else None
        self.model = GFObjectPose(
            marginal_prob_fn=self.sde.marginal_prob,
            pose_mode=cfg.pose_mode,
            regression_head=cfg.regression_head,
            posenet_mode=self.mode,
            pts_encoder=cfg.pts_encoder,
            pointnet2_params=cfg.pointnet2_params,
            num_points=cfg.num_points,
            energy_mode=cfg.energy_mode,
            s_theta_mode=cfg.s_theta_mode,
            norm_energy=cfg.norm_energy,
            decoder_head=self.is_edm and self.mode == "score",
            fast_grad_gathers=cfg.gather_grad == "fast",
            fast_fwd_gathers=cfg.gather_fwd == "fast",
            dtype=dtype,
            head_dtype=head_dtype,
            bn_dtype=bn_dtype,
            geometry_dtype=geometry_dtype,
            f32_stages=cfg.encoder_f32_stages,
        )

        key = jax.random.PRNGKey(cfg.seed if seed is None else seed)
        dummy_pts = jnp.zeros((2, cfg.num_points, 3))
        dummy_pose = jnp.zeros((2, self.pose_dim))
        dummy_t = jnp.full((2, 1), 0.5)
        variables = self.model.init(key, dummy_pts, dummy_pose, dummy_t, train=False)

        self.state = create_train_state(
            variables,
            base_lr=cfg.lr,
            warmup_steps=cfg.warmup,
            decay_per_epoch=cfg.lr_decay,
            steps_per_epoch=steps_per_epoch,
            floor_lr=cfg.lr_floor,
            grad_clip=cfg.grad_clip,
            ema_rate=cfg.ema_rate,
            optimizer=cfg.optimizer,
        )
        if mesh is not None:
            from genpose_tpu.parallel.mesh import replicate

            self.state = replicate(mesh, self.state)

        # jitted entry points (donate state for in-place update on device)
        self._train_step_score = jax.jit(self._train_step_score_impl, donate_argnums=(0,))
        self._train_step_energy = jax.jit(self._train_step_energy_impl, donate_argnums=(0,))
        self._ema_loss = jax.jit(self._ema_loss_impl)
        self._sample = jax.jit(
            self._sample_impl,
            static_argnames=("repeat_num", "sampler", "num_steps", "use_ema",
                            "return_process", "return_geometry"),
        )
        self._get_energy = jax.jit(
            self._get_energy_impl, static_argnames=("use_ema",)
        )
        self._likelihood = jax.jit(
            self._likelihood_impl, static_argnames=("num_steps",)
        )
        # optional frozen (weights-as-constants) inference programs; see freeze()
        self._frozen_state = None
        self._sample_frozen = None
        self._get_energy_frozen = None

    def freeze(self):
        """Bake the CURRENT state into the sampling/energy programs as
        XLA constants (eval/serving-time, weights pinned; same trick as
        ``InferencePipeline.freeze``).  Round-4 same-session A/B: within
        noise vs passing the state as a jit argument (+0.1–0.8%,
        bench_evidence/onchip_r4/freeze_ab_*.jsonl, BASELINE.md r4) — kept
        because it is never slower and skips the per-dispatch state
        marshaling.  ``sample``/``get_energy`` use the
        frozen programs only while ``self.state`` is still the captured
        object; re-call after loading a different checkpoint."""
        import functools as _ft

        state = self.state
        self._frozen_state = state
        self._sample_frozen = jax.jit(
            _ft.partial(self._sample_impl, state),
            static_argnames=("repeat_num", "sampler", "num_steps", "use_ema",
                             "return_process", "return_geometry"),
        )
        self._get_energy_frozen = jax.jit(
            _ft.partial(self._get_energy_impl, state),
            static_argnames=("use_ema",),
        )
        return self

    # ------------------------------------------------------------------
    # internals
    # ------------------------------------------------------------------

    def _encode_and_score_fn(self, params, batch_stats, pts, train: bool,
                             geometry=None):
        """Encode pts (once) and build score_fn over the cached feature."""
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            feat, mutated = self.model.apply(
                variables, pts, train=True, geometry=geometry,
                method=GFObjectPose.encode_pts, mutable=["batch_stats"],
            )
            new_stats = mutated["batch_stats"]
        else:
            feat = self.model.apply(
                variables, pts, train=False, geometry=geometry,
                method=GFObjectPose.encode_pts,
            )
            new_stats = batch_stats
        return feat, new_stats

    def pts_geometry(self, pts):
        """Weight-independent PointNet++ geometry (FPS + ball query + grouped
        coords) of a cloud — compute ONCE per pipeline and pass to both the
        score and energy agents' ``_sample_impl``/``_get_energy_impl``; it is
        identical for every encoder since it depends only on coordinates.
        Returns None for encoders without a geometry pass."""
        if self.cfg.pts_encoder in ("pointnet2", "pointnet_and_pointnet2"):
            from genpose_tpu.models.pointnet2 import cls_msg_geometry

            gdt = (self.model.dtype if self.model.geometry_dtype is None
                   else self.model.geometry_dtype)
            return cls_msg_geometry(pts, self.cfg.pointnet2_params,
                                    dtype=gdt,
                                    f32_stages=(0 if self.model.geometry_dtype
                                                is not None
                                                else self.model.f32_stages))
        return None

    def _head_projs(self, variables, feat, repeat: int = 1):
        """Hoist the pts_feat tail projections: computed once here, reused by
        every sampler step (pts_feat is loop-invariant inside the scan).
        ``repeat`` folds K hypotheses in AFTER the projection: projecting
        bs rows and repeating the results is bit-identical to projecting
        bs*K repeated rows at 1/K the FLOPs (rows are independent).  One
        copy shared by the score/energy/denoise heads so the repeat ordering
        (which must match ``.reshape(bs, K, -1)``) cannot desynchronize."""
        projs = self.model.apply(variables, feat,
                                 method=GFObjectPose.precompute_head)
        if repeat > 1:
            projs = jax.tree.map(lambda p: jnp.repeat(p, repeat, axis=0),
                                 projs)
        return projs

    def _head_score_fn(self, params, batch_stats, feat, repeat: int = 1):
        variables = {"params": params, "batch_stats": batch_stats}
        projs = self._head_projs(variables, feat, repeat)
        if self.mode == "score":

            def score_fn(pose, t):
                return self.model.apply(variables, projs, pose, t,
                                        method=GFObjectPose.score_with)
        else:

            def score_fn(pose, t):
                def e_sum(p):
                    e = self.model.apply(variables, projs, p, t,
                                         decoupled_rt=False,
                                         method=GFObjectPose.energy_with)
                    return jnp.sum(e)

                return jax.grad(e_sum)(pose)

        return score_fn

    def _head_energy_fn(self, params, batch_stats, feat, repeat: int = 1):
        variables = {"params": params, "batch_stats": batch_stats}
        projs = self._head_projs(variables, feat, repeat)

        def energy_fn(pose, t):
            return self.model.apply(variables, projs, pose, t,
                                    decoupled_rt=True,
                                    method=GFObjectPose.energy_with)

        return energy_fn

    def _head_denoise_fn(self, params, batch_stats, feat, repeat: int = 1):
        """denoise_fn(pose, sigma) -> denoised pose (EDM).  Native for the
        decoder head; for score/energy heads derived via the exact identity
        D = x + sigma^2 * s(x, sigma)."""
        if self.model.decoder_head:
            variables = {"params": params, "batch_stats": batch_stats}
            projs = self._head_projs(variables, feat, repeat)

            def denoise_fn(pose, t):
                return self.model.apply(variables, projs, pose, t,
                                        method=GFObjectPose.denoise_with)

            return denoise_fn

        score_fn = self._head_score_fn(params, batch_stats, feat, repeat)

        def denoise_fn(pose, t):
            _, sigma = self.sde.marginal_prob(None, t)
            sigma = jnp.reshape(sigma, (-1, 1))
            return pose + sigma**2 * score_fn(pose, t)

        return denoise_fn

    def _gf_loss(self, params, batch_stats, feat, key, gt_pose):
        """The generative-framework DSM term: standard score matching, or the
        EDM loss when sde_mode=='edm' (ref ``posenet_agent.py:70-71``)."""
        if self.is_edm:
            denoise_fn = self._head_denoise_fn(params, batch_stats, feat)
            return edm_dsm_loss_repeated(
                denoise_fn, key, gt_pose, self.cfg.repeat_num,
                sigma_min=self.sde.eps, sigma_max=self.sde.T)
        score_fn = self._head_score_fn(params, batch_stats, feat)
        return dsm_loss_repeated(score_fn, key, gt_pose, self.sde,
                                 self.cfg.repeat_num)

    # ------------------------------------------------------------------
    # score training
    # ------------------------------------------------------------------

    def _train_step_score_impl(self, state: TrainState, batch: Dict[str, Any],
                               key: jax.Array):
        """One optimization step of denoising score matching."""

        def loss_fn(params):
            feat, new_stats = self._encode_and_score_fn(
                params, state.batch_stats, batch["zero_mean_pts"], train=True
            )
            loss = self._gf_loss(params, new_stats, feat, key,
                                 batch["zero_mean_gt_pose"])
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        return state, {"gf": loss}

    def _ema_loss_impl(self, state: TrainState, batch, key):
        """DSM loss under EMA weights, for monitoring (ref
        ``posenet_agent.py:200-224``)."""
        feat, _ = self._encode_and_score_fn(
            state.ema.shadow, state.batch_stats, batch["zero_mean_pts"], train=False
        )
        return self._gf_loss(state.ema.shadow, state.batch_stats, feat, key,
                             batch["zero_mean_gt_pose"])

    def train_step(self, batch, key) -> Dict[str, jnp.ndarray]:
        self.state, losses = self._train_step_score(self.state, batch, key)
        return losses

    def train_step_distill(self, teacher: "PoseAgent", batch, key):
        """DSM step against a frozen teacher's score instead of -z/std
        (ref ``losses.py:79-82``, ``trainer.py:406-419``).

        The jitted step closes over the teacher's MODEL (architecture +
        marginal_prob); only its weights are traced.  The cache is keyed by
        teacher identity so a different teacher object rebuilds the closure
        instead of silently reusing the first one's architecture."""
        if getattr(self, "_distill_teacher_id", None) != id(teacher):
            self._distill_teacher_id = id(teacher)

            @jax.jit
            def step(state, t_state, batch, key):
                def loss_fn(params):
                    feat, new_stats = self._encode_and_score_fn(
                        params, state.batch_stats, batch["zero_mean_pts"],
                        train=True)
                    score_fn = self._head_score_fn(params, new_stats, feat)
                    t_feat, _ = teacher._encode_and_score_fn(
                        t_state.ema.shadow, t_state.batch_stats,
                        batch["zero_mean_pts"], train=False)
                    teacher_fn = teacher._head_score_fn(
                        t_state.ema.shadow, t_state.batch_stats, t_feat)
                    loss = dsm_loss_repeated(
                        score_fn, key, batch["zero_mean_gt_pose"], self.sde,
                        self.cfg.repeat_num, teacher_score_fn=teacher_fn)
                    return loss, new_stats

                (loss, new_stats), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                state = state.apply_gradients(grads, new_batch_stats=new_stats)
                return state, {"gf": loss}

            self._train_step_distill = step
        self.state, losses = self._train_step_distill(
            self.state, teacher.state, batch, key)
        return losses

    def zero_head_outputs(self):
        """Re-zero the tail output layers after loading score weights into an
        energy net (ref ``posenet_agent.py`` via ``output_zero_initial``,
        ``trainer.py:426``)."""
        # tree_map rebuilds the dict containers, so in-place edits below
        # cannot alias the old state
        params = jax.tree_util.tree_map(lambda x: x, self.state.params)
        head = params["head"] if "head" in params else params
        # score/energy heads nest tails under "trunk"; the EDM decoder head
        # keeps them at its top level
        trunk = head["trunk"] if "trunk" in head else head
        if "tails" in trunk:  # fused bank
            trunk["tails"]["out_kernel"] = jnp.zeros_like(
                trunk["tails"]["out_kernel"])
            trunk["tails"]["out_bias"] = jnp.zeros_like(
                trunk["tails"]["out_bias"])
        else:
            for k in trunk:
                if k.startswith("tail") and "out" in trunk[k]:
                    trunk[k]["out"]["kernel"] = jnp.zeros_like(
                        trunk[k]["out"]["kernel"])
                    trunk[k]["out"]["bias"] = jnp.zeros_like(
                        trunk[k]["out"]["bias"])
        self.state = self.state.replace(
            params=params, ema=self.state.ema.replace(shadow=params))

    def ema_loss(self, batch, key) -> jnp.ndarray:
        return self._ema_loss(self.state, batch, key)

    # ------------------------------------------------------------------
    # energy training (score DSM + ranking; ref posenet_agent.py:262-283)
    # ------------------------------------------------------------------

    def _train_step_energy_impl(self, state: TrainState, batch, pose_samples,
                                key: jax.Array, geometry=None):
        """pose_samples: [bs, K, pose_dim] candidates from the (frozen) score
        model, translations in the ORIGINAL (un-centered) frame.

        ``geometry``: optional precomputed weight-independent encoder
        geometry of ``batch["zero_mean_pts"]`` (``pts_geometry``) — the
        energy-with-ranking loop shares ONE geometry pass between the
        teacher's candidate sampling and this step (the iteration is
        encoder-bound; see BASELINE.md r3)."""
        k_dsm, k_t = jax.random.split(key)
        bs, K, _ = pose_samples.shape

        # GT error metrics for ranking (on device; ref uses numpy get_metrics)
        flat = pose_samples.reshape(bs * K, -1)
        gt_rep = jnp.repeat(batch["gt_pose"], K, axis=0)
        ids_rep = jnp.repeat(batch["id"].reshape(-1), K, axis=0)
        hv_rep = jnp.repeat(batch["handle_visibility"].reshape(-1), K, axis=0)
        rot_err, trans_err = pose_errors_jax(
            flat, gt_rep, ids_rep, hv_rep, self.cfg.synset_names,
            self.cfg.pose_mode, self.cfg.o2c_pose,
        )
        metrics = jnp.stack([rot_err, trans_err], axis=-1).reshape(bs, K, 2)

        # candidate poses in the zero-centered frame for the energy net
        centered = pose_samples.at[..., -3:].add(-batch["pts_center"][:, None, :])
        t_int = jax.random.randint(k_t, (bs, 1), 1, 10).astype(jnp.float32)
        t_samples = jnp.repeat(t_int / 1e5, K, axis=1).reshape(bs * K, 1)

        def loss_fn(params):
            feat, new_stats = self._encode_and_score_fn(
                params, state.batch_stats, batch["zero_mean_pts"], train=True,
                geometry=geometry,
            )
            dsm = self._gf_loss(params, new_stats, feat, k_dsm,
                                batch["zero_mean_gt_pose"])

            energy_fn = self._head_energy_fn(params, new_stats, feat,
                                             repeat=K)
            energy = energy_fn(centered.reshape(bs * K, -1), t_samples)
            energy = energy.reshape(bs, K, 2)
            sorted_energy = sort_results(energy, metrics)
            rank = ranking_loss(sorted_energy)
            return dsm + rank, (new_stats, dsm, rank)

        (loss, (new_stats, dsm, rank)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        return state, {"gf": dsm, "ranking": rank}

    def train_step_energy(self, batch, pose_samples, key, geometry=None):
        self.state, losses = self._train_step_energy(
            self.state, batch, pose_samples, key, geometry
        )
        return losses

    # ------------------------------------------------------------------
    # sampling (K hypotheses; ref posenet_agent.py:416-468)
    # ------------------------------------------------------------------

    def _sample_impl(
        self,
        state: TrainState,
        batch,
        key: jax.Array,
        repeat_num: int = 1,
        sampler: str = "ode",
        num_steps: int = 500,
        T0: Optional[float] = None,
        init_x: Optional[jnp.ndarray] = None,
        use_ema: bool = True,
        return_process: bool = False,
        geometry=None,
        return_geometry: bool = False,
    ):
        """Returns pred_pose [bs, repeat_num, pose_dim] (original frame).

        ``return_geometry=True`` additionally returns the weight-independent
        encoder geometry of ``pts`` (computing it here if not given), so a
        downstream energy pass over the SAME cloud — the energy-with-ranking
        training loop — can reuse it without a second geometry pass or a
        separate dispatch."""
        params = state.ema.shadow if use_ema else state.params
        pts = batch["zero_mean_pts"]
        bs = pts.shape[0]
        if self.is_edm and T0 is not None and sampler != "edm":
            # Runner-facing T0 is a [0,1] time FRACTION (cfg.T0: 0.55 eval /
            # 0.15 tracking) but EDM "time" IS sigma (sde.T = sigma_max=80):
            # passing the fraction through would start the PF-ODE at
            # sigma=T0 from a prior drawn at sigma_start.  Map it onto the
            # sigma ladder geometrically — the same rule as ``edm_sampler``
            # — and let the T-aware ``edm_prior`` draw at that sigma.
            smin, smax = self.sde.eps, self.sde.T
            if isinstance(T0, (int, float)):
                T0 = smax if T0 >= 1.0 else smin ** (1.0 - T0) * smax ** T0
            else:
                t0c = jnp.clip(T0, 0.0, 1.0)
                T0 = jnp.where(t0c >= 1.0, smax,
                               smin ** (1.0 - t0c) * smax ** t0c)
        if return_geometry and geometry is None:
            geometry = self.pts_geometry(pts)
        feat, _ = self._encode_and_score_fn(params, state.batch_stats, pts,
                                            train=False, geometry=geometry)
        # fold K into the batch axis: [bs*K, ...]; the head projections are
        # computed on bs rows and repeated (see _head_score_fn)
        center_rep = jnp.repeat(batch["pts_center"], repeat_num, axis=0)
        init_rep = None
        if init_x is not None:
            init_rep = jnp.repeat(init_x, repeat_num, axis=0)

        score_fn = self._head_score_fn(params, state.batch_stats, feat,
                                       repeat=repeat_num)
        if sampler == "ode":
            process, res = ode_sampler(
                score_fn, key, bs * repeat_num, self.sde, self.cfg.pose_mode,
                num_steps=num_steps, T0=T0, init_x=init_rep,
                pts_center=center_rep, return_process=return_process,
            )
        elif sampler == "ode_adaptive":
            # reference-faithful adaptive RK45 at atol/rtol 1e-5 (the
            # reference's released eval integrates adaptively,
            # ``scripts/eval_single.sh`` sets no --sampling_steps)
            assert not return_process, "ode_adaptive has no fixed trajectory"
            process, res = ode_sampler_adaptive(
                score_fn, key, bs * repeat_num, self.sde, self.cfg.pose_mode,
                T0=T0, init_x=init_rep, pts_center=center_rep,
            )
        elif sampler == "pc":
            process, res = pc_sampler(
                score_fn, key, bs * repeat_num, self.sde, self.cfg.pose_mode,
                num_steps=num_steps, T0=T0, init_x=init_rep,
                pts_center=center_rep, return_process=return_process,
            )
        elif sampler == "edm":
            # Heun EDM sampler over the denoiser (ref ``cond_edm_sampler``,
            # ``samplers.py:230-290``).  The reference's version has no
            # init_x/T0 pathway, which would make EDM agents undrivable by
            # the runners (they always pass T0, default cfg.T0=1.0); ours
            # maps T0 onto the sigma ladder geometrically and adds prior
            # noise at sigma_start to init_x — see ``edm_sampler``'s
            # docstring for the documented deviation.  T0>=1.0 (the config
            # default) means a full-length prior start.
            assert self.is_edm, "sampler='edm' requires sde_mode='edm'"
            denoise_fn = self._head_denoise_fn(params, state.batch_stats, feat,
                                               repeat=repeat_num)
            process, res = edm_sampler(
                denoise_fn, key, bs * repeat_num, self.cfg.pose_mode,
                num_steps=num_steps, sigma_min=self.sde.eps,
                sigma_max=self.sde.T, pts_center=center_rep,
                return_process=return_process, T0=T0, init_x=init_rep,
            )
        else:
            raise NotImplementedError(sampler)

        res = res.reshape(bs, repeat_num, -1)
        if return_process:
            process = process.reshape(bs, repeat_num, process.shape[1], -1)
            return (process, res, geometry) if return_geometry else (process, res)
        return (res, geometry) if return_geometry else res

    def sample(self, batch, key, repeat_num=1, sampler=None, num_steps=None,
               T0=None, init_x=None, use_ema=True, return_process=False,
               geometry=None, return_geometry=False):
        sampler = sampler or (self.cfg.sampler_mode[0] if self.cfg.sampler_mode
                              else "ode")
        if sampler == "edm" and num_steps is None:
            num_steps = 18  # ref cond_edm_sampler default (samplers.py:232)
        num_steps = num_steps or self.cfg.sampling_steps
        if self._frozen_state is not None and self._frozen_state is self.state:
            return self._sample_frozen(
                batch, key, repeat_num=repeat_num, sampler=sampler,
                num_steps=num_steps, T0=T0, init_x=init_x, use_ema=use_ema,
                return_process=return_process, geometry=geometry,
                return_geometry=return_geometry,
            )
        return self._sample(
            self.state, batch, key, repeat_num=repeat_num, sampler=sampler,
            num_steps=num_steps, T0=T0, init_x=init_x, use_ema=use_ema,
            return_process=return_process, geometry=geometry,
            return_geometry=return_geometry,
        )

    # ------------------------------------------------------------------
    # energies of candidate poses (ref posenet_agent.py:471-527)
    # ------------------------------------------------------------------

    def _get_energy_impl(self, state: TrainState, batch, pose_samples,
                         t_input, use_ema: bool = False, geometry=None):
        params = state.ema.shadow if use_ema else state.params
        bs, K, _ = pose_samples.shape
        feat, _ = self._encode_and_score_fn(
            params, state.batch_stats, batch["zero_mean_pts"], train=False,
            geometry=geometry,
        )
        centered = pose_samples.at[..., -3:].add(-batch["pts_center"][:, None, :])
        energy_fn = self._head_energy_fn(params, state.batch_stats, feat,
                                         repeat=K)
        e = energy_fn(centered.reshape(bs * K, -1), t_input.reshape(bs * K, 1))
        return e.reshape(bs, K, -1)

    def get_energy(self, batch, pose_samples, T: Optional[float] = None,
                   key: Optional[jax.Array] = None, use_ema: bool = False):
        bs, K, _ = pose_samples.shape
        if T is not None:
            t_input = jnp.full((bs, K), T)
        else:
            assert key is not None
            t_int = jax.random.randint(key, (bs, 1), 1, 10).astype(jnp.float32)
            t_input = jnp.repeat(t_int / 1e5, K, axis=1)
        if self._frozen_state is not None and self._frozen_state is self.state:
            return self._get_energy_frozen(batch, pose_samples, t_input,
                                           use_ema=use_ema)
        return self._get_energy(self.state, batch, pose_samples, t_input,
                                use_ema=use_ema)

    # ------------------------------------------------------------------
    # likelihood (ref posenet.py:133-147)
    # ------------------------------------------------------------------

    def _likelihood_impl(self, state: TrainState, batch, poses, key,
                         num_steps: int = 500):
        feat, _ = self._encode_and_score_fn(
            state.ema.shadow, state.batch_stats, batch["zero_mean_pts"],
            train=False,
        )
        score_fn = self._head_score_fn(state.ema.shadow, state.batch_stats, feat)
        return ode_likelihood(score_fn, key, poses, self.sde,
                              self.cfg.pose_mode, num_steps=num_steps)

    def likelihood(self, batch, poses, key, num_steps=500):
        return self._likelihood(self.state, batch, poses, key,
                                num_steps=num_steps)

    # ------------------------------------------------------------------
    # hypothesis aggregation (ref posenet_agent.py:450-463)
    # ------------------------------------------------------------------

    def aggregate_hypotheses(self, pred_pose: jnp.ndarray):
        """Quaternion-average K hypotheses -> [bs, 7] (wxyz + t)."""
        bs, K, _ = pred_pose.shape
        flat = pred_pose.reshape(bs * K, -1)
        rot = get_rot_matrix(flat[:, :-3], self.cfg.pose_mode)
        quat = matrix_to_quat_wxyz(rot).reshape(bs, K, 4)
        avg_q = average_quaternion_batch(quat)
        avg_t = jnp.mean(pred_pose[..., -3:], axis=1)
        pred_q = jnp.concatenate([quat, pred_pose[..., -3:]], axis=-1)
        avg = jnp.concatenate([avg_q, avg_t], axis=-1)
        return pred_q, avg
