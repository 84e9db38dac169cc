"""InferencePipeline (serving API) tests."""

import jax
import numpy as np
import pytest

from genpose_tpu.config import Config
from genpose_tpu.runners.serving import InferencePipeline


@pytest.fixture(scope="module")
def pipe():
    cfg = Config(num_points=64, batch_size=4, eval_repeat_num=3,
                 sampling_steps=4, T0=0.55)
    p = InferencePipeline(cfg)
    # DISTINCT weights for the two agents: fresh inits share cfg.seed, so
    # their encoders are bit-identical and a frozen (weights-as-constants)
    # program would let XLA CSE the energy trunk — production checkpoints
    # differ, so the tests should exercise the un-CSE-able shape (also
    # un-zeroes the heads, so sampling does real work)
    from genpose_tpu.utils.benchmarking import derandomize_state

    p.score_agent.state = derandomize_state(p.score_agent.state)
    p.energy_agent.state = derandomize_state(p.energy_agent.state, seed=43)
    return p.warmup()


def test_predict_shapes_and_finite(pipe):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(4, 64, 3)).astype(np.float32) * 0.1
    out = pipe.predict(pts, key=jax.random.PRNGKey(1))
    assert out["pred_pose"].shape == (4, 7)
    assert out["best_pose"].shape == (4, 7)
    assert out["sorted_hypotheses"].shape == (4, 3, 9)
    assert out["energy"].shape == (4, 3, 2)
    for v in out.values():
        assert np.isfinite(v).all()
    # unit quaternion out of the pooling
    np.testing.assert_allclose(
        np.linalg.norm(out["pred_pose"][:, :4], axis=1), 1.0, atol=1e-4)


def test_predict_padding_independence(pipe):
    """Results for real rows must not depend on the padding rows."""
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(2, 64, 3)).astype(np.float32) * 0.1  # < bs=4
    full = rng.normal(size=(4, 64, 3)).astype(np.float32) * 0.1
    full[:2] = pts
    key = jax.random.PRNGKey(2)
    short = pipe.predict(pts, key=key)
    assert short["pred_pose"].shape == (2, 7)
    # the SAME two rows fed through a full batch of DIFFERENT companion
    # rows give bit-identical poses: the fixed-step sampler treats rows
    # independently given the same PRNG layout, so the pad rows (repeats
    # of the last real row, serving.py) cannot contaminate real rows
    full_out = pipe.predict(full, key=key)
    np.testing.assert_allclose(short["pred_pose"], full_out["pred_pose"][:2],
                               atol=0, rtol=0)


def test_predict_chunks_long_batches(pipe):
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(9, 64, 3)).astype(np.float32) * 0.1  # > 2 chunks
    out = pipe.predict(pts, key=jax.random.PRNGKey(3))
    assert out["pred_pose"].shape == (9, 7)
    assert np.isfinite(out["pred_pose"]).all()


def test_predict_with_adaptive_sampler():
    """cfg.sampler_mode=('ode_adaptive',) routes the pipeline through the
    reference-faithful adaptive RK45 (the bench.py default)."""
    cfg = Config(num_points=64, batch_size=2, eval_repeat_num=2, T0=0.55,
                 sampler_mode=("ode_adaptive",))
    pipe_ad = InferencePipeline(cfg)
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(2, 64, 3)).astype(np.float32) * 0.1
    out = pipe_ad.predict(pts, key=jax.random.PRNGKey(9))
    assert out["pred_pose"].shape == (2, 7)
    for v in out.values():
        assert np.isfinite(v).all()


def test_predict_under_mesh_matches_unsharded(pipe):
    """The full serving pipeline under the 8-device dp mesh returns the same
    poses as the single-device pipeline (same seeds, global reductions)."""
    from genpose_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    cfg = Config(num_points=64, batch_size=8, eval_repeat_num=3,
                 sampling_steps=4, T0=0.55)
    sharded = InferencePipeline(cfg, mesh=mesh)
    plain = InferencePipeline(cfg)

    rng = np.random.default_rng(7)
    pts = rng.normal(size=(8, 64, 3)).astype(np.float32) * 0.1
    out_s = sharded.predict(pts, key=jax.random.PRNGKey(3))
    out_p = plain.predict(pts, key=jax.random.PRNGKey(3))
    for k in out_p:
        assert np.isfinite(out_s[k]).all()
        np.testing.assert_allclose(out_s[k], out_p[k], rtol=2e-4, atol=2e-4)


def test_predict_empty_request():
    """n == 0 must return empty, correctly-shaped arrays (review regression:
    it crashed with IndexError on outs[0])."""
    import numpy as np

    from genpose_tpu.config import Config
    from genpose_tpu.runners.serving import InferencePipeline

    cfg = Config(num_points=32, eval_repeat_num=2, sampling_steps=2,
                 batch_size=2)
    pipe = InferencePipeline(cfg, batch_size=2)
    out = pipe.predict(np.zeros((0, 32, 3), np.float32))
    assert out["pred_pose"].shape == (0, 7)
    assert out["best_pose"].shape == (0, 7)
    assert out["sorted_hypotheses"].shape == (0, 2, 9)
    assert out["energy"].shape == (0, 2, 2)


def test_freeze_matches_unfrozen(pipe):
    """freeze() bakes the weights as XLA constants; predictions must match
    the argument-passing path (same computation, possibly different fusion
    order), and stale frozen programs must be bypassed when states change."""
    rng = np.random.default_rng(11)
    pts = rng.normal(size=(4, 64, 3)).astype(np.float32) * 0.1
    key = jax.random.PRNGKey(4)
    base = pipe.predict(pts, key=key)
    try:
        pipe.freeze()
        frozen = pipe.predict(pts, key=key)
        for k in base:
            np.testing.assert_allclose(frozen[k], base[k],
                                       rtol=2e-4, atol=2e-4)

        # swapping states bypasses the (now stale) frozen program
        st = pipe.score_agent.state
        bumped = jax.tree.map(lambda x: x + 0.05, st.params)
        pipe.score_agent.state = st.replace(
            params=bumped, ema=st.ema.replace(shadow=bumped))
        changed = pipe.predict(pts, key=key)
        assert not np.allclose(changed["pred_pose"], base["pred_pose"])
        pipe.score_agent.state = st
        # re-freeze captures the restored weights again
        pipe.freeze()
        refrozen = pipe.predict(pts, key=key)
        for k in base:
            np.testing.assert_allclose(refrozen[k], base[k],
                                       rtol=2e-4, atol=2e-4)
    finally:
        pipe._run_frozen = None


def test_sharded_serving_program_actually_partitions():
    """Same anti-replication guard for the serving pipeline: under the
    8-device dp mesh the compiled program must do ~1/8 the FLOPs per device
    (a silent fallback to replication passes every equivalence test)."""
    from genpose_tpu.parallel.mesh import make_mesh, shard_batch
    from genpose_tpu.utils.benchmarking import flops_from_cost

    mesh = make_mesh(8)
    cfg = Config(num_points=64, batch_size=8, eval_repeat_num=3,
                 sampling_steps=4, T0=0.55)
    sharded = InferencePipeline(cfg, mesh=mesh)
    plain = InferencePipeline(cfg)

    rng = np.random.default_rng(7)
    pts = rng.normal(size=(8, 64, 3)).astype(np.float32) * 0.1
    key = jax.random.PRNGKey(3)
    spts = shard_batch(mesh, {"pts": jax.numpy.asarray(pts)})["pts"]

    comp_m = sharded._run.lower(sharded.score_agent.state,
                                sharded.energy_agent.state, spts, key).compile()
    comp_1 = plain._run.lower(plain.score_agent.state,
                              plain.energy_agent.state,
                              jax.numpy.asarray(pts), key).compile()
    fm = flops_from_cost(comp_m.cost_analysis())
    f1 = flops_from_cost(comp_1.cost_analysis())
    assert f1 > 0 and fm > 0
    ratio = fm / f1
    assert ratio < 0.25, (
        f"per-device serving FLOPs {ratio:.3f} of unsharded — the batch is "
        f"being replicated instead of partitioned (expected ~1/8)")


def test_frozen_flops_cse_canary():
    """Regression test for the round-3 benchmark-integrity bug: when the
    score and energy agents hold IDENTICAL encoder weights (both init from
    PRNGKey(cfg.seed); a same-seed derandomization preserves that), the
    frozen weights-as-constants program lets XLA CSE the entire duplicate
    energy trunk — compiled FLOPs collapse and any throughput measured on it
    is inflated vs a real deployment with distinct checkpoints.

    Pins both directions (measured on the CPU mesh: distinct = 0.995x args,
    same-seed = 0.505x distinct):
      1. with DISTINCT weights the frozen program does ~the args program's
         FLOPs (freezing must not silently drop compute), and
      2. with IDENTICAL weights the FLOPs DO collapse — proving the canary
         detects the artifact it guards against.
    """
    from genpose_tpu.utils.benchmarking import derandomize_state, flops_from_cost

    cfg = Config(num_points=64, batch_size=4, eval_repeat_num=3,
                 sampling_steps=4, T0=0.55)
    p = InferencePipeline(cfg)
    ss0, es0 = p.score_agent.state, p.energy_agent.state
    key = jax.random.PRNGKey(0)
    pts = jax.numpy.asarray(
        np.random.default_rng(0).normal(size=(4, 64, 3)).astype(np.float32) * 0.1)

    f_args = flops_from_cost(
        p._run.lower(ss0, es0, pts, key).compile().cost_analysis())

    p.score_agent.state = derandomize_state(ss0, seed=42)
    p.energy_agent.state = derandomize_state(es0, seed=43)
    f_distinct = flops_from_cost(
        p.freeze()._run_frozen.lower(pts, key).compile().cost_analysis())

    p.energy_agent.state = derandomize_state(es0, seed=42)  # encoder == score's
    f_same = flops_from_cost(
        p.freeze()._run_frozen.lower(pts, key).compile().cost_analysis())

    assert f_args > 0 and f_distinct > 0 and f_same > 0
    assert f_distinct > 0.9 * f_args, (
        f"frozen program with distinct weights dropped to "
        f"{f_distinct / f_args:.3f}x the args program's FLOPs — XLA is "
        f"folding away real serving compute; benchmark numbers from this "
        f"program would be inflated")
    assert f_same < 0.7 * f_distinct, (
        f"identical-weight frozen program reads {f_same / f_distinct:.3f}x "
        f"the distinct-weight FLOPs — the canary no longer detects the "
        f"duplicate-trunk CSE it guards against")
