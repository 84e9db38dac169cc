"""Training-stack tests: state/EMA/schedule, ranking, agent end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from genpose_tpu.config import Config
from genpose_tpu.training.ranking import ranking_loss, sort_poses_by_energy, sort_results
from genpose_tpu.training.state import EMA, make_lr_schedule


def test_lr_schedule():
    """warmup over 100 steps, 0.98/epoch decay, 1e-4 floor
    (ref posenet_agent.py:543-550)."""
    sched = make_lr_schedule(1e-3, 100, 0.98, steps_per_epoch=50)
    assert np.isclose(float(sched(0)), 0.0)
    assert np.isclose(float(sched(50)), 5e-4 * 0.98)  # half warmup, epoch 1
    assert np.isclose(float(sched(100)), 1e-3 * 0.98**2)  # epoch 2 started
    # floor: after many epochs lr stays just under 1e-4, never collapses
    late = float(sched(50 * 1000))
    assert 9e-5 < late < 1.01e-4


def test_ema_warmup_decay():
    """EMA decay = min(rate, (1+n)/(10+n)) (ref score_utils.py:25-45)."""
    params = {"w": jnp.zeros(3)}
    ema = EMA.create(params, decay=0.999)
    new_params = {"w": jnp.ones(3)}
    ema = ema.update(new_params)
    # first update: decay = 2/11 -> shadow = 0*2/11 + 1*(9/11)
    np.testing.assert_allclose(np.asarray(ema.shadow["w"]), 9.0 / 11.0, rtol=1e-6)


def test_ranking_loss_reference_value():
    """Reproduces the reference smoke test (reward.py:158-164):
    energies [100, 9, 8, 10] sorted by (assumed) GT order."""
    energy = jnp.asarray([[[100.0, 100], [9, 9], [8, 8], [10, 10]]])
    loss = float(ranking_loss(energy))
    # pairs (i<j): (0,1),(0,2),(0,3),(1,2),(1,3),(2,3)
    # diff = 1 + (ej-ei)/(|ei-ej|+1e-5): ~0 when ei>ej else ~2
    # (0,*): ei=100 > all -> ~0 each; (1,2): 9>8 -> ~0; (1,3): 9<10 -> ~2
    # (2,3): 8<10 -> ~2  => mean = 4/6
    assert abs(loss - 4.0 / 6.0) < 1e-3


def test_ranking_loss_perfectly_ranked_is_zero():
    e = jnp.asarray(np.linspace(10, 1, 5).reshape(1, 5, 1).repeat(2, -1))
    assert float(ranking_loss(e)) < 1e-3
    e_bad = e[:, ::-1]
    assert abs(float(ranking_loss(e_bad)) - 2.0) < 1e-3


def test_sort_results():
    rng = np.random.default_rng(0)
    energy = jnp.asarray(rng.normal(size=(2, 5, 2)).astype(np.float32))
    metrics = jnp.asarray(rng.uniform(size=(2, 5, 2)).astype(np.float32))
    out = np.asarray(sort_results(energy, metrics))
    for b in range(2):
        for c in range(2):
            order = np.argsort(np.asarray(metrics)[b, :, c])
            np.testing.assert_array_equal(out[b, :, c],
                                          np.asarray(energy)[b, order, c])


def test_sort_poses_by_energy_decoupled():
    """Pose rows follow rot-energy order; translations follow trans-energy
    order (ref reward.py:131-155)."""
    poses = jnp.asarray(np.arange(2 * 3 * 9, dtype=np.float32).reshape(2, 3, 9))
    energy = jnp.asarray(
        [[[1.0, 3.0], [3.0, 1.0], [2.0, 2.0]],
         [[9.0, 7.0], [7.0, 9.0], [8.0, 8.0]]]
    )
    sp, se = sort_poses_by_energy(poses, energy)
    sp, se = np.asarray(sp), np.asarray(se)
    p = np.asarray(poses)
    # batch 0: rot order (desc rot-energy) = [1, 2, 0]; trans order = [0, 2, 1]
    np.testing.assert_array_equal(sp[0, :, :6], p[0][[1, 2, 0], :6])
    np.testing.assert_array_equal(sp[0, :, 6:], p[0][[0, 2, 1], 6:])
    np.testing.assert_array_equal(se[0, :, 0], [3, 2, 1])
    np.testing.assert_array_equal(se[0, :, 1], [3, 2, 1])


def _tiny_cfg(**kw):
    base = dict(
        num_points=64, repeat_num=2, sampling_steps=8, batch_size=4,
        pointnet2_params="light", warmup=2, sampler_mode=("ode",),
    )
    base.update(kw)
    return Config(**base)


def _make_batch(cfg, key, bs=4):
    k1, k2, k3 = jax.random.split(key, 3)
    pts = jax.random.normal(k1, (bs, cfg.num_points, 3)) * 0.1
    gt = jax.random.normal(k2, (bs, 9))
    center = jax.random.normal(k3, (bs, 3)) * 0.01
    return {
        "zero_mean_pts": pts,
        "zero_mean_gt_pose": gt,
        "gt_pose": gt.at[:, -3:].add(center),
        "pts_center": center,
        "id": jnp.zeros((bs,), jnp.int32),
        "handle_visibility": jnp.ones((bs,), jnp.int32),
    }


def test_score_agent_train_and_sample():
    from genpose_tpu.training.agent import PoseAgent

    cfg = _tiny_cfg()
    agent = PoseAgent(cfg, posenet_mode="score", steps_per_epoch=4)
    batch = _make_batch(cfg, jax.random.PRNGKey(0))

    l0 = agent.train_step(batch, jax.random.PRNGKey(1))
    l1 = agent.train_step(batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(l0["gf"])) and np.isfinite(float(l1["gf"]))
    assert int(agent.state.step) == 2

    ema = agent.ema_loss(batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(ema))

    pred = agent.sample(batch, jax.random.PRNGKey(4), repeat_num=3,
                        sampler="ode", num_steps=8)
    assert pred.shape == (4, 3, 9)
    assert np.isfinite(np.asarray(pred)).all()
    # rotation blocks are normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(pred)[..., :3], axis=-1), 1.0, atol=1e-4)

    pred_q, avg = agent.aggregate_hypotheses(pred)
    assert pred_q.shape == (4, 3, 7) and avg.shape == (4, 7)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(avg)[:, :4], axis=-1),
                               1.0, atol=1e-4)


def test_energy_agent_train_and_energy():
    from genpose_tpu.training.agent import PoseAgent

    cfg = _tiny_cfg()
    agent = PoseAgent(cfg, posenet_mode="energy", steps_per_epoch=4)
    batch = _make_batch(cfg, jax.random.PRNGKey(5))
    pose_samples = jax.random.normal(jax.random.PRNGKey(6), (4, 5, 9))

    losses = agent.train_step_energy(batch, pose_samples, jax.random.PRNGKey(7))
    assert np.isfinite(float(losses["gf"]))
    assert np.isfinite(float(losses["ranking"]))
    assert 0.0 <= float(losses["ranking"]) <= 2.0

    e = agent.get_energy(batch, pose_samples, T=1e-5)
    assert e.shape == (4, 5, 2)
    e2 = agent.get_energy(batch, pose_samples, key=jax.random.PRNGKey(8))
    assert e2.shape == (4, 5, 2)

    # energy model can also act as a score model (grad of energy) and sample
    pred = agent.sample(batch, jax.random.PRNGKey(9), repeat_num=2,
                        sampler="ode", num_steps=6)
    assert pred.shape == (4, 2, 9)


def test_energy_train_step_shared_geometry_is_exact():
    """The energy-with-ranking loop's geometry sharing (teacher sample →
    energy step) is bit-exact: sample(return_geometry=True) returns the same
    candidates as a plain sample, and train_step_energy with the shared
    geometry produces the same losses and parameters as encoding from
    scratch."""
    from genpose_tpu.training.agent import PoseAgent

    cfg = _tiny_cfg()
    score_agent = PoseAgent(cfg, posenet_mode="score", steps_per_epoch=4)
    batch = _make_batch(cfg, jax.random.PRNGKey(20))

    plain = score_agent.sample(batch, jax.random.PRNGKey(21), repeat_num=2,
                               sampler="ode", num_steps=6)
    pred, geom = score_agent.sample(batch, jax.random.PRNGKey(21),
                                    repeat_num=2, sampler="ode", num_steps=6,
                                    return_geometry=True)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(pred))
    assert geom is not None  # pointnet2 encoder has a geometry pass

    a = PoseAgent(cfg, posenet_mode="energy", steps_per_epoch=4)
    b = PoseAgent(cfg, posenet_mode="energy", steps_per_epoch=4)
    # identical initial state; copied because the train step donates buffers
    b.state = jax.tree.map(jnp.copy, a.state)

    la = a.train_step_energy(batch, pred, jax.random.PRNGKey(22))
    lb = b.train_step_energy(batch, pred, jax.random.PRNGKey(22),
                             geometry=geom)
    for k in la:
        np.testing.assert_array_equal(np.asarray(la[k]), np.asarray(lb[k]))
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)),
        a.state.params, b.state.params)


def test_agent_likelihood():
    from genpose_tpu.training.agent import PoseAgent

    cfg = _tiny_cfg()
    agent = PoseAgent(cfg, posenet_mode="score", steps_per_epoch=4)
    batch = _make_batch(cfg, jax.random.PRNGKey(10))
    poses = jax.random.normal(jax.random.PRNGKey(11), (4, 9))
    z, ll = agent.likelihood(batch, poses, jax.random.PRNGKey(12), num_steps=8)
    assert z.shape == (4, 9) and ll.shape == (4,)
    assert np.isfinite(np.asarray(ll)).all()


def test_sharded_train_step():
    """DP over the 8-device CPU mesh: loss finite, params stay replicated."""
    from genpose_tpu.parallel.mesh import make_mesh, shard_batch
    from genpose_tpu.training.agent import PoseAgent

    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    cfg = _tiny_cfg(batch_size=8)
    agent = PoseAgent(cfg, posenet_mode="score", steps_per_epoch=4, mesh=mesh)
    batch = _make_batch(cfg, jax.random.PRNGKey(13), bs=8)
    batch = shard_batch(mesh, batch)

    losses = agent.train_step(batch, jax.random.PRNGKey(14))
    assert np.isfinite(float(losses["gf"]))

    pred = agent.sample(batch, jax.random.PRNGKey(15), repeat_num=2,
                        sampler="ode", num_steps=6)
    assert pred.shape == (8, 2, 9)


def test_distillation_step_and_zero_head():
    """Energy net warm-started from score weights, outputs re-zeroed, then a
    distillation DSM step against the frozen teacher (ref trainer.py:406-426)."""
    from genpose_tpu.training.agent import PoseAgent

    cfg = _tiny_cfg()
    teacher = PoseAgent(cfg, posenet_mode="score", steps_per_epoch=4, seed=0)
    # a fresh score net outputs score=0 (zero-init tails); perturb the
    # teacher so the distillation target is nonzero
    leaves, td = jax.tree_util.tree_flatten(teacher.state.params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    tparams = jax.tree_util.tree_unflatten(
        td, [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
             for l, k in zip(leaves, keys)])
    teacher.state = teacher.state.replace(
        params=tparams, ema=teacher.state.ema.replace(shadow=tparams))
    student = PoseAgent(cfg, posenet_mode="energy", steps_per_epoch=4, seed=1)

    # score params load into the energy tree (identical trunk structure)
    student.state = student.state.replace(params=jax.tree_util.tree_map(
        lambda s, t: t, student.state.params, teacher.state.params))
    student.zero_head_outputs()
    tails = student.state.params["head"]["trunk"]["tails"]
    assert float(jnp.abs(tails["out_kernel"]).max()) == 0.0

    batch = _make_batch(cfg, jax.random.PRNGKey(3))
    l0 = student.train_step_distill(teacher, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(l0["gf"]))
    for _ in range(3):
        l = student.train_step_distill(teacher, batch, jax.random.PRNGKey(5))
    # student moves toward the teacher score -> loss shrinks on a fixed batch
    assert float(l["gf"]) < float(l0["gf"])


def test_trainer_cli_final_checkpoint_and_likelihood(tmp_path, monkeypatch):
    """A run with n_epochs < eval_freq must still write a final checkpoint
    (round-1 VERDICT weak point 6), and --likelihood drives the PF-ODE
    log-likelihood path through the CLI (mode parity with
    ``posenet.py:166-168``)."""
    import json
    import os

    from genpose_tpu.data.synthetic import make_synthetic_nocs_dir
    from genpose_tpu.runners import trainer

    data_dir = str(tmp_path / "nocs")
    make_synthetic_nocs_dir(data_dir, n_camera_scenes=2, n_real_scenes=2,
                            seed=3)
    monkeypatch.chdir(tmp_path)

    common = [
        "--data_path", data_dir, "--batch_size", "4", "--mini_bs", "4",
        "--num_points", "64", "--repeat_num", "2", "--sampling_steps", "4",
        "--num_workers", "1", "--log_dir", "polish", "--warmup", "2",
        "--num_devices", "1",
    ]
    trainer.main(["--agent_type", "score", "--is_train", "true",
                  "--n_epochs", "1", "--eval_freq", "100"] + common)
    from genpose_tpu.training.checkpoints import latest_checkpoint

    ckpt_dir = tmp_path / "results" / "ckpts" / "polish"
    assert latest_checkpoint(str(ckpt_dir))  # saved despite eval_freq=100

    trainer.main(["--agent_type", "score", "--likelihood", "true",
                  "--max_eval_num", "1"] + common)
    lik = (tmp_path / "results" / "inference_results" / "polish" /
           "Real_likelihood" / "likelihood.json")
    assert lik.exists()
    summary = json.loads(lik.read_text())
    assert np.isfinite(summary["mean_bits"]) and summary["n"] > 0


def test_trainer_cli_energy_with_ranking(tmp_path, monkeypatch):
    """The energy_with_ranking CLI flow end-to-end (ref ``trainer.py:325-388``
    via ``trainer.py:434-442``): a pinned pretrained score teacher generates
    K=5 candidates per batch online (weights passed as jit arguments — the
    teacher is deliberately NOT frozen, see ``train_energy``) and the energy
    agent trains DSM + ranking; a checkpoint must land."""
    from genpose_tpu.data.synthetic import make_synthetic_nocs_dir
    from genpose_tpu.runners import trainer
    from genpose_tpu.training.checkpoints import latest_checkpoint

    data_dir = str(tmp_path / "nocs")
    make_synthetic_nocs_dir(data_dir, n_camera_scenes=2, n_real_scenes=2,
                            seed=5)
    monkeypatch.chdir(tmp_path)

    common = [
        "--data_path", data_dir, "--batch_size", "4", "--mini_bs", "4",
        "--num_points", "64", "--repeat_num", "2", "--sampling_steps", "4",
        "--num_workers", "1", "--warmup", "2", "--num_devices", "1",
    ]
    trainer.main(["--agent_type", "score", "--is_train", "true",
                  "--n_epochs", "1", "--eval_freq", "100",
                  "--log_dir", "teach"] + common)
    score_ckpt = latest_checkpoint(str(tmp_path / "results/ckpts/teach"))
    assert score_ckpt

    trainer.main(["--agent_type", "energy_with_ranking", "--is_train", "true",
                  "--n_epochs", "1", "--eval_freq", "100",
                  "--log_dir", "rank",
                  "--pretrained_score_model_path", score_ckpt] + common)
    assert latest_checkpoint(str(tmp_path / "results/ckpts/rank"))


def test_sharded_energy_train_step_matches_unsharded():
    """The energy/ranking step (DSM + O(K^2) pair loss + on-device GT error
    metrics) under the 8-device dp mesh must match the single-device result:
    the sharded reductions are global, so the losses are the same math
    (round-1 VERDICT weak point 4: sharded coverage was score-only)."""
    from genpose_tpu.parallel.mesh import make_mesh, shard_batch
    from genpose_tpu.training.agent import PoseAgent

    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    cfg = _tiny_cfg(batch_size=8)
    batch = _make_batch(cfg, jax.random.PRNGKey(23), bs=8)
    pose_samples = jax.random.normal(jax.random.PRNGKey(24), (8, 5, 9))

    sharded = PoseAgent(cfg, "energy", steps_per_epoch=4, mesh=mesh)
    plain = PoseAgent(cfg, "energy", steps_per_epoch=4)  # same cfg.seed init
    l_sharded = sharded.train_step_energy(
        shard_batch(mesh, batch), shard_batch(mesh, pose_samples),
        jax.random.PRNGKey(25))
    l_plain = plain.train_step_energy(batch, pose_samples,
                                      jax.random.PRNGKey(25))
    for k in ("gf", "ranking"):
        assert np.isfinite(float(l_sharded[k]))
        np.testing.assert_allclose(float(l_sharded[k]), float(l_plain[k]),
                                   rtol=1e-4)
    # params remain fully replicated after the update
    leaf = jax.tree_util.tree_leaves(sharded.state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_energy_train_geometry_sharing_under_mesh():
    """The energy-with-ranking loop's geometry sharing (teacher
    ``sample(return_geometry=True)`` -> ``train_step_energy(geometry=...)``)
    under the 8-device dp mesh: the sharded run with shared geometry matches
    the single-device run exactly (same candidates, same losses)."""
    from genpose_tpu.parallel.mesh import make_mesh, shard_batch
    from genpose_tpu.training.agent import PoseAgent

    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    cfg = _tiny_cfg(batch_size=8)
    batch = _make_batch(cfg, jax.random.PRNGKey(26), bs=8)

    teacher_m = PoseAgent(cfg, "score", steps_per_epoch=4, mesh=mesh)
    teacher_1 = PoseAgent(cfg, "score", steps_per_epoch=4)
    sb = shard_batch(mesh, batch)
    pred_m, geom_m = teacher_m.sample(
        sb, jax.random.PRNGKey(27), repeat_num=3, sampler="ode", num_steps=4,
        return_geometry=True)
    pred_1, geom_1 = teacher_1.sample(
        batch, jax.random.PRNGKey(27), repeat_num=3, sampler="ode",
        num_steps=4, return_geometry=True)
    np.testing.assert_allclose(np.asarray(pred_m), np.asarray(pred_1),
                               rtol=1e-5, atol=1e-5)
    assert geom_m is not None and geom_1 is not None

    e_m = PoseAgent(cfg, "energy", steps_per_epoch=4, mesh=mesh)
    e_1 = PoseAgent(cfg, "energy", steps_per_epoch=4)  # same cfg.seed init
    l_m = e_m.train_step_energy(sb, pred_m, jax.random.PRNGKey(28),
                                geometry=geom_m)
    l_1 = e_1.train_step_energy(batch, pred_1, jax.random.PRNGKey(28),
                                geometry=geom_1)
    for k in ("gf", "ranking"):
        assert np.isfinite(float(l_m[k]))
        np.testing.assert_allclose(float(l_m[k]), float(l_1[k]), rtol=1e-4)


def test_distill_closure_rebuilds_per_teacher():
    """train_step_distill keys its jitted closure by teacher identity
    (review regression: the first teacher's model/SDE was silently reused
    for every later teacher)."""
    from genpose_tpu.config import Config
    from genpose_tpu.training.agent import PoseAgent

    cfg = Config(num_points=32, repeat_num=2, batch_size=4, sampling_steps=2)
    student = PoseAgent(cfg, "score", steps_per_epoch=4)
    t_ve = PoseAgent(cfg, "score", steps_per_epoch=4, seed=1)
    t_vp = PoseAgent(cfg.replace(sde_mode="vp"), "score", steps_per_epoch=4,
                     seed=1)

    key = jax.random.PRNGKey(0)
    batch = {
        "zero_mean_pts": jax.random.normal(key, (4, 32, 3)) * 0.1,
        "zero_mean_gt_pose": jax.random.normal(key, (4, 9)),
        "pts_center": jnp.zeros((4, 3)),
    }
    l1 = student.train_step_distill(t_ve, batch, jax.random.PRNGKey(1))
    assert student._distill_teacher_id == id(t_ve)
    assert np.isfinite(float(l1["gf"]))
    # a different teacher object (different SDE!) must rebuild the closure
    l2 = student.train_step_distill(t_vp, batch, jax.random.PRNGKey(2))
    assert student._distill_teacher_id == id(t_vp)
    assert np.isfinite(float(l2["gf"]))


def test_reward_model_forward_and_grad():
    """RewardModel (ref ``reward.py:14-60``): plain flax module with the
    reference architecture — pose 256->256, concat with the 1024-d pts
    feature, 1280->256->2 — trainable (finite grads)."""
    from genpose_tpu.training.ranking import RewardModel

    model = RewardModel(pose_mode="rot_matrix")
    key = jax.random.PRNGKey(0)
    feat = jax.random.normal(key, (4, 1024))
    pose = jax.random.normal(jax.random.PRNGKey(1), (4, 9))
    params = model.init(key, feat, pose)
    out = model.apply(params, feat, pose)
    assert out.shape == (4, 2)
    n_params = sum(int(np.prod(np.shape(x)))
                   for x in jax.tree_util.tree_leaves(params))
    # reference param count: (9*256+256)+(256*256+256)+(1280*256+256)+(256*2+2)
    assert n_params == (9 * 256 + 256) + (256 * 256 + 256) + \
        (1280 * 256 + 256) + (256 * 2 + 2)

    def loss(p):
        return jnp.sum(model.apply(p, feat, pose) ** 2)

    grads = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_agent_freeze_matches_unfrozen():
    """PoseAgent.freeze(): sample/get_energy through the weights-as-constants
    programs must match the argument-passing programs, and a state swap must
    bypass the stale frozen programs."""
    import numpy as np

    from genpose_tpu.training.agent import PoseAgent

    cfg = Config(num_points=64, batch_size=4, eval_repeat_num=3,
                 sampling_steps=4, T0=0.55)
    agent = PoseAgent(cfg, "score", steps_per_epoch=10)
    leaves, treedef = jax.tree_util.tree_flatten(agent.state.params)
    keys = jax.random.split(jax.random.PRNGKey(21), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [l + 0.02 * jax.random.normal(k, l.shape)
                  for l, k in zip(leaves, keys)])
    agent.state = agent.state.replace(
        params=params, ema=agent.state.ema.replace(shadow=params))

    batch = {
        "zero_mean_pts": jax.random.normal(jax.random.PRNGKey(1),
                                           (4, 64, 3)) * 0.1,
        "pts_center": jnp.zeros((4, 3)),
    }
    base = np.asarray(agent.sample(batch, jax.random.PRNGKey(2),
                                   repeat_num=3, sampler="ode", num_steps=4))
    agent.freeze()
    frozen = np.asarray(agent.sample(batch, jax.random.PRNGKey(2),
                                     repeat_num=3, sampler="ode", num_steps=4))
    np.testing.assert_allclose(frozen, base, rtol=2e-4, atol=2e-4)

    e_agent = PoseAgent(cfg, "energy", steps_per_epoch=10).freeze()
    en_frozen = np.asarray(e_agent.get_energy(batch, jnp.asarray(base), T=1e-5))
    e_agent2 = PoseAgent(cfg, "energy", steps_per_epoch=10)
    en_base = np.asarray(e_agent2.get_energy(batch, jnp.asarray(base), T=1e-5))
    np.testing.assert_allclose(en_frozen, en_base, rtol=2e-4, atol=2e-4)

    # a state swap makes the frozen program stale -> argument path used
    bumped = jax.tree_util.tree_map(lambda x: x + 0.05, params)
    agent.state = agent.state.replace(
        params=bumped, ema=agent.state.ema.replace(shadow=bumped))
    changed = np.asarray(agent.sample(batch, jax.random.PRNGKey(2),
                                      repeat_num=3, sampler="ode", num_steps=4))
    assert not np.allclose(changed, base)


def test_sharded_train_step_actually_partitions():
    """Anti-replication program-shape guard (the multi-chip analogue of the
    round-3 CSE lesson): numeric-equivalence tests would still pass if the
    sharded step silently replicated the whole batch on every device, so
    assert the COMPILED program's shape instead — (a) it contains a
    cross-device gradient all-reduce, and (b) its per-device FLOPs are
    ~1/8 of the unsharded step's (measured 0.126 on the 8-device CPU mesh;
    the psum adds <1% at these shapes)."""
    from genpose_tpu.parallel.mesh import make_mesh, shard_batch
    from genpose_tpu.training.agent import PoseAgent
    from genpose_tpu.utils.benchmarking import flops_from_cost

    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    cfg = _tiny_cfg(batch_size=8)
    batch = _make_batch(cfg, jax.random.PRNGKey(13), bs=8)
    key = jax.random.PRNGKey(14)

    sharded = PoseAgent(cfg, "score", steps_per_epoch=4, mesh=mesh)
    plain = PoseAgent(cfg, "score", steps_per_epoch=4)
    comp_m = sharded._train_step_score.lower(
        sharded.state, shard_batch(mesh, batch), key).compile()
    comp_1 = plain._train_step_score.lower(plain.state, batch, key).compile()

    assert "all-reduce" in comp_m.as_text(), (
        "sharded train step compiled without a gradient all-reduce")
    fm = flops_from_cost(comp_m.cost_analysis())
    f1 = flops_from_cost(comp_1.cost_analysis())
    assert f1 > 0 and fm > 0
    ratio = fm / f1
    assert ratio < 0.2, (
        f"per-device FLOPs {ratio:.3f} of unsharded — batch work is being "
        f"replicated instead of partitioned (expected ~1/8)")
