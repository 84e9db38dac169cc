"""Composed TRAINING-update parity vs the running torch reference.

The one equivalence axis the golden forward tests cannot see (round-4
verdict #2): N real optimization steps run in BOTH implementations from
identical ported init, on identical batches, with identical pre-drawn DSM
noise — and the loss trajectory, final params, EMA shadow, BN running
stats, and lr trace must agree.  This pins end-to-end:

- Adam semantics (bias correction, eps OUTSIDE the sqrt, lr-after-moments)
  — ref ``posenet_agent.py:92-114`` vs our optax chain (``state.py``);
- clip-by-global-norm 1.0 BEFORE the optimizer step
  (``posenet_agent.py:530-540``);
- the linear-warmup + per-epoch ExponentialLR schedule **call sites**
  (``runners/trainer.py:283-303``, ``posenet_agent.py:543-550``);
- EMA warmup decay ``min(rate, (1+n)/(10+n))`` updated after each optimizer
  step (``score_utils.py:25-45``);
- BatchNorm batch-stat timing: one train-mode encoder pass per step, batch
  statistics used for normalization, UNBIASED variance tracked in
  running_var (torch ``F.batch_norm`` semantics — ``TorchBatchNorm``,
  layers.py);
- the energy/ranking composite step: shared encoder pass, DSM + O(K^2)
  pairwise ranking summed into one backward, the candidate-translation
  centering and the ``randint(1,10)/1e5`` t-draw
  (``posenet_agent.py:227-259, 471-527``).

Noise injection: the reference's ``losses.loss_fn`` draws via module-level
``torch.rand``/``torch.randn_like`` and ``get_energy`` via
``torch.randint`` — a restorable proxy module pops pre-drawn arrays from
queues; the JAX side consumes the same arrays through a test-jitted step
that reuses the production internals (``_encode_and_score_fn``,
``_head_score_fn``, ``TrainState.apply_gradients``) with the 7-line DSM
formula inlined (``dsm_loss`` with the draw replaced by the injected
noise).

DOCUMENTED DEVIATION (see PARITY.md): the reference's warmup never reaches
the nominal lr — its last pre-batch warmup update fires at
``clock.step == warmup-1`` (``trainer.py:284``), pinning lr at
``base*(warmup-1)/warmup`` for the rest of training (0.99x at the released
config).  Our production ``make_lr_schedule`` reaches the full base lr; the
trajectory tests below therefore drive our state with the reference's EXACT
simulated lr table (create_train_state's ``lr_schedule`` hook), and
``test_lr_schedule_vs_reference_is_exactly_the_warmup_quirk`` pins that the
production schedule differs from the reference's by exactly the constant
factor warmup/(warmup-1) after warmup and nowhere else.
"""

from __future__ import annotations

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import _reference_bridge as rb

from genpose_tpu.config import Config
from genpose_tpu.training.agent import PoseAgent
from genpose_tpu.training.state import create_train_state, make_lr_schedule
from genpose_tpu.utils.torch_port import port_gf_state_dict

N_PTS = 1024   # the 'light' MSG config FPS tables need >= 512 points
BS = 2
REPEAT = 2
LR = 1e-3
EMA_RATE = 0.999


# ---------------------------------------------------------------------------
# shared machinery
# ---------------------------------------------------------------------------


class _QueueTorch:
    """Proxy for the ``torch`` module binding inside reference modules:
    ``rand``/``randn_like``/``randint`` pop pre-loaded tensors (the injected
    noise), every other attribute delegates to real torch."""

    def __init__(self, real):
        self._real = real
        self.rand_q: list = []
        self.randn_q: list = []
        self.randint_q: list = []

    def rand(self, *a, **kw):
        return self.rand_q.pop(0)

    def randn_like(self, x):
        return self.randn_q.pop(0)

    def randint(self, *a, **kw):
        return self.randint_q.pop(0)

    def __getattr__(self, name):
        return getattr(self._real, name)


def _ref_agent_cfg(mode: str, warmup: int, gamma: float):
    return types.SimpleNamespace(
        device="cpu", parallel=False, num_gpu=1,
        pts_encoder="pointnet2", pose_mode="rot_matrix",
        regression_head="Rx_Ry_and_T", posenet_mode=mode,
        energy_mode="IP", s_theta_mode="score", norm_energy="identical",
        num_points=N_PTS, sampling_steps=None, sde_mode="ve",
        pointnet2_params="light", hidden_dim=128,
        optimizer="Adam", lr=LR, lr_decay=gamma, ema_rate=EMA_RATE,
        grad_clip=1.0, warmup=warmup, repeat_num=REPEAT,
        likelihood_weighting=False,
        is_train=False, use_pretrain=False, log_dir="parity", model_name=None,
        synset_names=["bottle", "bowl", "camera", "can", "laptop", "mug"],
        o2c_pose=True,
    )


def _randomize_sane_bn(net, seed: int, scale: float = 0.05) -> None:
    """Like ``rb.randomize_net`` but with BatchNorm scales near 1 (and conv
    weights at ``scale``): ``randomize_net``'s gamma ~ N(0, 0.05) collapses
    every layer's activation scale, so every TRAIN-mode BN normalizes up by
    ~50-200x (1/sqrt(batch_var+eps) with batch_var << 1) and float noise
    compounds through the 24 BN layers to ~1e-2 relative — an amplification
    artifact of degenerate weights, not a semantic difference (eval-mode
    parity on the same weights is 1.5e-8; BN itself is bit-exact per layer).
    Near-unit gammas keep activation variances O(1) and the cross-
    implementation noise at float level, so the trajectory tolerances below
    have teeth."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)
        for m in net.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.weight.copy_(
                    1.0 + 0.1 * torch.randn(m.weight.shape, generator=g))
                m.bias.copy_(
                    0.05 * torch.randn(m.bias.shape, generator=g))
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.05)
                m.running_var.copy_(
                    1.0 + 0.1 * torch.rand(m.running_var.shape, generator=g))


def _make_ref_agent(mode: str, seed: int, warmup: int, gamma: float,
                    optimizer: str = "Adam"):
    """The reference's OWN PoseNet agent (optimizer + scheduler + EMA +
    update_network), net randomized, EMA re-seeded from the randomized
    params (the constructor snapshots pre-randomization weights)."""
    agent_mod = rb.import_reference("networks.posenet_agent")
    cfgn = _ref_agent_cfg(mode, warmup, gamma)
    cfgn.optimizer = optimizer
    tagent = agent_mod.PoseNet(cfgn)
    _randomize_sane_bn(tagent.net, seed)
    tagent.ema = agent_mod.ExponentialMovingAverage(
        tagent.net.parameters(), decay=EMA_RATE)
    return agent_mod, tagent


def _port(tnet, agent):
    ported = port_gf_state_dict(tnet.state_dict(), agent.state.variables,
                                pts_encoder="pointnet2",
                                regression_head="Rx_Ry_and_T")
    # MATERIALIZE: the port returns numpy views of the live torch buffers,
    # which the reference's in-place optimizer/EMA ops keep mutating — a
    # snapshot taken as views would silently track the torch trajectory
    return jax.tree_util.tree_map(lambda x: jnp.array(x), ported)


def _make_batches(n_batches: int, seed: int):
    """Zero-mean clouds so 'pts' (what the reference encodes) and
    'zero_mean_pts' (what we encode) are IDENTICAL arrays — the encoder is
    translation-invariant by construction (relative-offset grouping, see
    PARITY.md), so this removes only float roundoff from the comparison."""
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_batches):
        pts = (rng.randn(BS, N_PTS, 3) * 0.1).astype(np.float32)
        pts -= pts.mean(axis=1, keepdims=True)
        gt = (rng.randn(BS, 9) * 0.5).astype(np.float32)
        out.append({"pts": pts, "gt": gt})
    return out


def _ref_lr_table(base, warmup, gamma, steps_per_epoch, total_steps,
                  floor=1e-4):
    """Faithful simulation of the reference's lr trajectory: pre-batch
    manual warmup while ``clock.step < warmup`` (``trainer.py:283-284``,
    ``posenet_agent.py:543-550``), per-epoch ExponentialLR compounding off
    the CURRENT group lr, frozen once lr < floor.  lrs[k] is the lr the
    k-th optimizer step runs at."""
    lrs, lr = [], base  # torch param_group initializes at base
    for k in range(total_steps):
        if k < warmup:
            lr = base / warmup * k
        lrs.append(lr)
        step_after = k + 1
        if step_after % steps_per_epoch == 0:  # trainer.py:303 epoch end
            if step_after <= warmup:
                lr = base / warmup * step_after
            elif not lr < floor:
                lr = lr * gamma
    return np.asarray(lrs, np.float32)


def _tree_allclose(a, b, rtol, atol, what):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32),
                                   rtol=rtol, atol=atol, err_msg=what)


def _ema_ported_params(tagent, agent):
    """Port the torch agent's EMA shadow (via store/copy_to/restore)."""
    params = list(tagent.net.parameters())
    tagent.ema.store(params)
    tagent.ema.copy_to(params)
    ported = _port(tagent.net, agent)["params"]
    tagent.ema.restore(params)
    return ported


# ---------------------------------------------------------------------------
# score training trajectory
# ---------------------------------------------------------------------------


def test_score_training_trajectory_matches_reference(tmp_path, monkeypatch):
    """12 composed score-DSM optimization steps (3 epochs x 4 batches,
    warmup 3 crossing into decay, gamma 0.3 so epoch 3 exercises the 1e-4
    floor freeze) in the reference's own agent + trainer call pattern vs our
    TrainState — loss trajectory, lr trace, final params, EMA shadow and BN
    running stats all agree.  Ref: ``runners/trainer.py:266-322``,
    ``networks/posenet_agent.py:286-311, 530-550``.

    Optimizer is SGD (momentum 0.9 + weight decay 1e-4 + clip 1.0 — the
    reference's other supported optimizer, ``posenet_agent.py:97-103``):
    SGD updates are LINEAR in the gradients, so the ~1e-4-relative
    cross-implementation float noise in the encoder backward stays at float
    level across the whole trajectory.  A composed ADAM trajectory is NOT
    assertable at meaningful tolerance: Adam's first-step update is
    ~lr*sign(g), so params whose |g| sits below the cross-impl noise floor
    flip sign and diverge by a full 2*lr each (measured: max param diff
    6.5e-4 after ONE lr/3 Adam update, compounding to 12% loss drift by
    step 12 — chaos, not semantics).  Adam's update math is instead pinned
    bit-tight on synthetic gradients by
    ``test_adam_clip_schedule_update_math_matches_torch`` below; together
    the two cover the full optimizer matrix."""
    monkeypatch.chdir(tmp_path)
    STEPS_PER_EPOCH, N_EPOCHS, WARMUP, GAMMA = 4, 3, 3, 0.3
    TOTAL = STEPS_PER_EPOCH * N_EPOCHS

    agent_mod, tagent = _make_ref_agent("score", 11, WARMUP, GAMMA,
                                        optimizer="SGD")
    losses_mod = rb.import_reference("networks.gf_algorithms.losses")

    batches = _make_batches(2, seed=5)
    rng = np.random.RandomState(7)
    U = rng.rand(TOTAL, REPEAT, BS).astype(np.float32)
    Z = rng.randn(TOTAL, REPEAT, BS, 9).astype(np.float32)

    # ---- our agent with ported init and the reference's exact lr table ----
    # exact f32 gathers: the production defaults gather_fwd/grad='fast'
    # (single-pass MXU, bf16-rounded values) are a documented deviation with
    # their own on-chip convergence evidence (BASELINE.md r3); parity is
    # against the reference's exact math
    cfg = Config(num_points=N_PTS, repeat_num=REPEAT, batch_size=BS, lr=LR,
                 lr_decay=GAMMA, warmup=WARMUP, ema_rate=EMA_RATE,
                 grad_clip=1.0, gather_fwd="exact", gather_grad="exact")
    agent = PoseAgent(cfg, "score", steps_per_epoch=STEPS_PER_EPOCH)
    variables = _port(tagent.net, agent)
    lr_table = _ref_lr_table(LR, WARMUP, GAMMA, STEPS_PER_EPOCH, TOTAL)
    table = jnp.asarray(lr_table)
    state = create_train_state(
        variables, grad_clip=1.0, ema_rate=EMA_RATE, optimizer="SGD",
        lr_schedule=lambda s: table[jnp.clip(s, 0, TOTAL - 1)])

    sde = agent.sde

    @jax.jit
    def jstep(state, pts, gt, u, z):  # u [R,bs], z [R,bs,9]
        def loss_fn(params):
            feat, new_stats = agent._encode_and_score_fn(
                params, state.batch_stats, pts, train=True)
            score_fn = agent._head_score_fn(params, new_stats, feat)

            def one(u_r, z_r):
                # dsm_loss (losses.py) with the draws injected
                t = (u_r * (1.0 - sde.eps) + sde.eps)[:, None]
                mu, std = sde.marginal_prob(gt, t)
                std = jnp.reshape(std, (BS, 1))
                x = mu + z_r * std
                est = score_fn(x, t)
                return jnp.mean(
                    jnp.sum((std ** 2) * (est + z_r / std) ** 2, axis=-1))

            return jnp.mean(jax.vmap(one)(u, z)), new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return state.apply_gradients(grads, new_batch_stats=new_stats), loss

    # ---- run both loops ----
    proxy = _QueueTorch(torch)
    patch = rb.Patcher()
    patch(losses_mod, "torch", proxy)
    t_losses, t_lrs = [], []
    try:
        for k in range(TOTAL):
            if tagent.clock.step < WARMUP:      # trainer.py:283-284
                tagent.update_learning_rate()
            b = batches[k % len(batches)]
            data = {
                "pts": torch.from_numpy(b["pts"]),
                "zero_mean_pts": torch.from_numpy(b["pts"]),
                "zero_mean_gt_pose": torch.from_numpy(b["gt"]),
            }
            for r in range(REPEAT):
                proxy.rand_q.append(torch.from_numpy(U[k, r]))
                proxy.randn_q.append(torch.from_numpy(Z[k, r]))
            tagent.net.train()
            data["pts_feat"] = tagent.net(data, mode="pts_feature")
            losses = tagent.collect_score_loss(data)    # agent.py:176-197
            t_lrs.append(tagent.optimizer.param_groups[0]["lr"])
            tagent.update_network(losses)               # agent.py:530-540
            tagent.ema.update(tagent.net.parameters())
            t_losses.append(float(losses["gf"].detach()))
            tagent.clock.tick()
            if (k + 1) % STEPS_PER_EPOCH == 0:          # trainer.py:303
                tagent.update_learning_rate()
                tagent.clock.tock()
    finally:
        patch.restore()
    assert not proxy.rand_q and not proxy.randn_q  # exact draw accounting

    j_losses = []
    for k in range(TOTAL):
        b = batches[k % len(batches)]
        state, loss = jstep(state, jnp.asarray(b["pts"]),
                            jnp.asarray(b["gt"]),
                            jnp.asarray(U[k]), jnp.asarray(Z[k]))
        j_losses.append(float(loss))

    # ---- compare ----
    np.testing.assert_allclose(t_lrs, lr_table, rtol=1e-6,
                               err_msg="lr table simulation drifted from the "
                                       "reference scheduler")
    # tolerance: the cross-impl float-noise floor on encoder grads is
    # ~1e-4 relative (24 BN layers); it compounds linearly through SGD
    # momentum — measured max loss drift 6e-4 rel at step 12
    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-3, atol=1e-5)

    final_t = _port(tagent.net, agent)
    _tree_allclose(state.params, final_t["params"], rtol=5e-3, atol=5e-5,
                   what="final params after 12 steps")
    _tree_allclose(state.batch_stats, final_t["batch_stats"],
                   rtol=5e-3, atol=5e-5, what="BN running stats")
    _tree_allclose(state.ema.shadow, _ema_ported_params(tagent, agent),
                   rtol=5e-3, atol=5e-5, what="EMA shadow")
    assert int(state.ema.num_updates) == tagent.ema.num_updates == TOTAL


# ---------------------------------------------------------------------------
# energy/ranking composite step
# ---------------------------------------------------------------------------


def test_energy_ranking_steps_match_reference(tmp_path, monkeypatch):
    """3 composed energy-with-ranking steps: shared train-mode encoder pass,
    energy-DSM via the autograd score, K=3 candidate energies at the
    injected randint(1,10)/1e5 t, candidate-translation centering, GT-error
    sort + pairwise ranking loss, one summed backward through clip+SGD+EMA
    (SGD for the same chaos-avoidance reason as the score trajectory test;
    Adam math is pinned separately below).
    Ref: ``posenet_agent.py:227-284, 471-527``, ``reward.py:63-128``."""
    monkeypatch.chdir(tmp_path)
    TOTAL, K = 3, 3

    agent_mod, tagent = _make_ref_agent("energy", 13, 0, 0.98,
                                        optimizer="SGD")
    losses_mod = rb.import_reference("networks.gf_algorithms.losses")

    batches = _make_batches(2, seed=15)
    rng = np.random.RandomState(17)
    U = rng.rand(TOTAL, REPEAT, BS).astype(np.float32)
    Z = rng.randn(TOTAL, REPEAT, BS, 9).astype(np.float32)
    TI = rng.randint(1, 10, size=(TOTAL, BS, 1)).astype(np.int64)
    centers = (rng.randn(BS, 3) * 0.3).astype(np.float32)
    # candidates: translations in the ORIGINAL (uncentered) frame
    cands = rng.randn(TOTAL, BS, K, 9).astype(np.float32) * 0.5
    cands[..., -3:] += centers[None, :, None, :]
    ids = np.array([1, 4], np.int64)[:BS]
    hv = np.ones((BS,), np.int64)

    cfg = Config(num_points=N_PTS, repeat_num=REPEAT, batch_size=BS, lr=LR,
                 lr_decay=0.98, warmup=0, ema_rate=EMA_RATE, grad_clip=1.0,
                 gather_fwd="exact", gather_grad="exact")
    agent = PoseAgent(cfg, "energy", steps_per_epoch=1000)
    variables = _port(tagent.net, agent)
    state = create_train_state(
        variables, grad_clip=1.0, ema_rate=EMA_RATE, optimizer="SGD",
        lr_schedule=lambda s: jnp.full((), LR))  # no warmup/decay calls

    sde = agent.sde

    from genpose_tpu.eval.metrics import pose_errors_jax
    from genpose_tpu.training.ranking import ranking_loss, sort_results

    @jax.jit
    def jstep(state, pts, gt_zero, gt_full, pose_samples, u, z, t_int):
        # _train_step_energy_impl with the two draws injected
        flat = pose_samples.reshape(BS * K, -1)
        gt_rep = jnp.repeat(gt_full, K, axis=0)
        ids_rep = jnp.repeat(jnp.asarray(ids), K, axis=0)
        hv_rep = jnp.repeat(jnp.asarray(hv), K, axis=0)
        rot_err, trans_err = pose_errors_jax(
            flat, gt_rep, ids_rep, hv_rep, cfg.synset_names,
            cfg.pose_mode, cfg.o2c_pose)
        metrics = jnp.stack([rot_err, trans_err], axis=-1).reshape(BS, K, 2)

        centered = pose_samples.at[..., -3:].add(
            -jnp.asarray(centers)[:, None, :])
        t_samples = jnp.repeat(t_int / 1e5, K, axis=1).reshape(BS * K, 1)

        def loss_fn(params):
            feat, new_stats = agent._encode_and_score_fn(
                params, state.batch_stats, pts, train=True)
            score_fn = agent._head_score_fn(params, new_stats, feat)

            def one(u_r, z_r):
                t = (u_r * (1.0 - sde.eps) + sde.eps)[:, None]
                mu, std = sde.marginal_prob(gt_zero, t)
                std = jnp.reshape(std, (BS, 1))
                x = mu + z_r * std
                est = score_fn(x, t)
                return jnp.mean(
                    jnp.sum((std ** 2) * (est + z_r / std) ** 2, axis=-1))

            dsm = jnp.mean(jax.vmap(one)(u, z))
            energy_fn = agent._head_energy_fn(params, new_stats, feat,
                                              repeat=K)
            energy = energy_fn(centered.reshape(BS * K, -1), t_samples)
            energy = energy.reshape(BS, K, 2)
            rank = ranking_loss(sort_results(energy, metrics))
            return dsm + rank, (new_stats, dsm, rank)

        (loss, (new_stats, dsm, rank)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return (state.apply_gradients(grads, new_batch_stats=new_stats),
                dsm, rank)

    proxy = _QueueTorch(torch)
    patch = rb.Patcher()
    patch(losses_mod, "torch", proxy)
    patch(agent_mod, "torch", proxy)   # get_energy's randint, agent.py:507
    t_dsm, t_rank = [], []
    try:
        for k in range(TOTAL):
            b = batches[k % len(batches)]
            data = {
                "pts": torch.from_numpy(b["pts"]),
                "zero_mean_pts": torch.from_numpy(b["pts"]),
                "zero_mean_gt_pose": torch.from_numpy(b["gt"]),
                "gt_pose": torch.from_numpy(
                    b["gt"] + np.concatenate(
                        [np.zeros((BS, 6), np.float32), centers], axis=1)),
                "pts_center": torch.from_numpy(centers),
                "id": torch.from_numpy(ids),
                "handle_visibility": torch.from_numpy(hv),
            }
            for r in range(REPEAT):
                proxy.rand_q.append(torch.from_numpy(U[k, r]))
                proxy.randn_q.append(torch.from_numpy(Z[k, r]))
            proxy.randint_q.append(torch.from_numpy(TI[k]))
            tagent.net.train()
            data["pts_feat"] = tagent.net(data, mode="pts_feature")
            score_losses = tagent.collect_score_loss(data)
            ranking_losses = tagent.collect_ranking_loss(
                data, torch.from_numpy(cands[k]))
            tagent.update_network({**score_losses, **ranking_losses})
            tagent.ema.update(tagent.net.parameters())
            t_dsm.append(float(score_losses["gf"].detach()))
            t_rank.append(float(ranking_losses["ranking"].detach()))
    finally:
        patch.restore()
    assert not proxy.rand_q and not proxy.randint_q

    j_dsm, j_rank = [], []
    for k in range(TOTAL):
        b = batches[k % len(batches)]
        gt_full = b["gt"] + np.concatenate(
            [np.zeros((BS, 6), np.float32), centers], axis=1)
        state, dsm, rank = jstep(
            state, jnp.asarray(b["pts"]), jnp.asarray(b["gt"]),
            jnp.asarray(gt_full), jnp.asarray(cands[k]),
            jnp.asarray(U[k]), jnp.asarray(Z[k]),
            jnp.asarray(TI[k], jnp.float32))
        j_dsm.append(float(dsm))
        j_rank.append(float(rank))

    np.testing.assert_allclose(j_dsm, t_dsm, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(j_rank, t_rank, rtol=1e-3, atol=1e-5)
    final_t = _port(tagent.net, agent)
    _tree_allclose(state.params, final_t["params"], rtol=5e-3, atol=5e-5,
                   what="energy params after 3 steps")
    _tree_allclose(state.batch_stats, final_t["batch_stats"],
                   rtol=5e-3, atol=5e-5, what="energy BN running stats")
    _tree_allclose(state.ema.shadow, _ema_ported_params(tagent, agent),
                   rtol=5e-3, atol=5e-5, what="energy EMA shadow")


# ---------------------------------------------------------------------------
# Adam + clip + schedule update math, bit-tight on synthetic gradients
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("optimizer", ["Adam", "SGD"])
def test_optimizer_clip_schedule_update_math_matches_torch(optimizer):
    """The optax chain ``clip_by_global_norm(1.0) -> adam(schedule)`` +
    TrainState EMA vs torch ``clip_grad_norm_`` + ``optim.Adam`` + the
    reference EMA, driven with IDENTICAL synthetic gradients for 10 steps
    over a varying lr table (warmup ramp + decays) — params and EMA shadow
    must agree to float precision at every step.  Pins Adam bias
    correction, the eps-outside-sqrt placement, lr-after-moments, the
    clip-before-optimizer order, schedule step indexing (the k-th update
    uses table[k]), and the EMA warmup decay — WITHOUT the sign-flip chaos
    a composed network trajectory injects (see the SGD trajectory test's
    docstring).  Gradients include near-zero (eps-dominated), exactly-zero
    (the frozen-GaussianFourier analogue), and clip-triggering large
    values.  Ref: ``posenet_agent.py:105, 530-540``,
    ``score_utils.py:25-45``."""
    score_utils = rb.import_reference("networks.gf_algorithms.score_utils")

    rng = np.random.RandomState(3)
    shapes = [(4, 7), (16,), (3, 3, 5), (2,)]
    init = [rng.randn(*s).astype(np.float32) for s in shapes]
    STEPS = 10
    lr_tab = np.array([0.0, 5e-4, 1e-3, 1e-3, 3e-4, 3e-4, 9e-5, 9e-5,
                       9e-5, 9e-5], np.float32)
    grads_seq = []
    for k in range(STEPS):
        g = [rng.randn(*s).astype(np.float32) *
             (10.0 ** rng.randint(-9, 3)) for s in shapes]
        g[3] = np.zeros_like(g[3])   # frozen-param analogue: grad always 0
        grads_seq.append(g)

    # ---- torch ----
    tp = [torch.nn.Parameter(torch.from_numpy(x.copy())) for x in init]
    if optimizer == "Adam":
        opt = torch.optim.Adam(tp, betas=(0.9, 0.999), eps=1e-8, lr=1.0)
    else:  # the reference's SGD recipe (posenet_agent.py:97-103)
        opt = torch.optim.SGD(tp, lr=1.0, momentum=0.9, weight_decay=1e-4)
    ema_t = score_utils.ExponentialMovingAverage(tp, decay=EMA_RATE)
    t_hist = []
    for k in range(STEPS):
        opt.param_groups[0]["lr"] = float(lr_tab[k])
        opt.zero_grad()
        for p, g in zip(tp, grads_seq[k]):
            p.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_norm_(tp, max_norm=1.0)
        opt.step()
        ema_t.update(tp)
        t_hist.append([p.detach().numpy().copy() for p in tp])

    # ---- ours ----
    params = {f"p{i}": jnp.asarray(x) for i, x in enumerate(init)}
    table = jnp.asarray(lr_tab)
    state = create_train_state(
        {"params": params}, grad_clip=1.0, ema_rate=EMA_RATE,
        optimizer=optimizer,
        lr_schedule=lambda s: table[jnp.clip(s, 0, STEPS - 1)])
    for k in range(STEPS):
        grads = {f"p{i}": jnp.asarray(g) for i, g in enumerate(grads_seq[k])}
        state = state.apply_gradients(grads)
        for i in range(len(shapes)):
            np.testing.assert_allclose(
                np.asarray(state.params[f"p{i}"]), t_hist[k][i],
                rtol=1e-6, atol=1e-7, err_msg=f"step {k} param p{i}")
    # EMA shadow after 10 warmup-decayed updates
    ema_t.store(tp)
    ema_t.copy_to(tp)
    for i in range(len(shapes)):
        np.testing.assert_allclose(
            np.asarray(state.ema.shadow[f"p{i}"]),
            tp[i].detach().numpy(), rtol=1e-6, atol=1e-7,
            err_msg=f"EMA shadow p{i}")
    ema_t.restore(tp)
    assert int(state.ema.num_updates) == ema_t.num_updates == STEPS


# ---------------------------------------------------------------------------
# production lr schedule vs the reference's (the one documented deviation)
# ---------------------------------------------------------------------------


def test_lr_schedule_vs_reference_is_exactly_the_warmup_quirk():
    """At the released config (base 1e-3, warmup 100, gamma 0.98 per epoch,
    floor 1e-4), our production ``make_lr_schedule`` equals the faithful
    reference simulation bit-for-bit during warmup and differs by EXACTLY
    the constant factor warmup/(warmup-1) afterwards — the reference's last
    pre-batch warmup update fires at step warmup-1 and pins lr at
    0.99*base forever (``trainer.py:283-284``: the guard is
    ``clock.step < warmup`` and nothing re-raises lr after it).  Both sides
    freeze after the same 114 decays (the 0.99 factor does not shift the
    floor crossing at this config).  Deviation documented in PARITY.md —
    ours trains at the nominal lr."""
    base, warmup, gamma, spe = 1e-3, 100, 0.98, 1000
    epochs = 130
    total = spe * epochs
    ref = _ref_lr_table(base, warmup, gamma, spe, total)
    sched = make_lr_schedule(base, warmup, gamma, spe, floor_lr=1e-4)
    steps = np.arange(total)
    ours = np.asarray(jax.vmap(sched)(jnp.asarray(steps)), np.float32)

    np.testing.assert_allclose(ours[:warmup], ref[:warmup], rtol=1e-6,
                               err_msg="warmup ramp")
    ratio = ours[warmup:] / ref[warmup:]
    np.testing.assert_allclose(
        ratio, warmup / (warmup - 1.0), rtol=1e-5,
        err_msg="post-warmup deviation is not the documented constant")
    # floor: both frozen at the same epoch count (114 decays at this config)
    assert np.isclose(ours[-1], base * gamma ** 114, rtol=1e-5)
    assert np.isclose(ref[-1], base * (warmup - 1) / warmup * gamma ** 114,
                      rtol=1e-5)
