"""Tests for the TPU point-cloud primitives vs numpy oracles with exact
reference (CUDA) semantics."""

import numpy as np
import jax.numpy as jnp

from genpose_tpu.ops import pointcloud as pc
from genpose_tpu.ops.fps_pallas import fps_pallas


# ---------------------------------------------------------------------------
# numpy oracles transcribing the CUDA semantics
# ---------------------------------------------------------------------------

def fps_numpy(xyz, npoint):
    """sampling_gpu.cu:93-208: seed 0, iterative min-dist argmax."""
    B, N, _ = xyz.shape
    idx = np.zeros((B, npoint), np.int32)
    for b in range(B):
        mind = np.full(N, 1e10, np.float64)
        old = 0
        for j in range(1, npoint):
            d = np.sum((xyz[b] - xyz[b, old]) ** 2, axis=-1)
            mind = np.minimum(mind, d)
            old = int(np.argmax(mind))
            idx[b, j] = old
    return idx


def ball_query_numpy(radius, nsample, xyz, new_xyz):
    """ball_query_gpu.cu:29-43 transcription."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    idx = np.zeros((B, M, nsample), np.int32)
    r2 = radius * radius
    for b in range(B):
        for m in range(M):
            cnt = 0
            for k in range(N):
                d2 = np.sum((new_xyz[b, m] - xyz[b, k]) ** 2)
                if d2 < r2:
                    if cnt == 0:
                        idx[b, m, :] = k
                    idx[b, m, cnt] = k
                    cnt += 1
                    if cnt >= nsample:
                        break
    return idx


def test_fps_ref_matches_numpy():
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(4, 100, 3)).astype(np.float32)
    got = np.asarray(pc.farthest_point_sample_ref(jnp.asarray(xyz), 16))
    want = fps_numpy(xyz, 16)
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_matches_ref():
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(3, 256, 3)).astype(np.float32)
    got = np.asarray(fps_pallas(jnp.asarray(xyz), 64))
    want = np.asarray(pc.farthest_point_sample_ref(jnp.asarray(xyz), 64))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_unaligned_n():
    """N not a multiple of 1024: padded tail must never be selected."""
    rng = np.random.default_rng(2)
    xyz = rng.normal(size=(2, 777, 3)).astype(np.float32)
    got = np.asarray(fps_pallas(jnp.asarray(xyz), 32))
    assert got.max() < 777
    want = fps_numpy(xyz, 32)
    np.testing.assert_array_equal(got, want)


def test_fps_first_index_is_zero():
    rng = np.random.default_rng(3)
    xyz = rng.normal(size=(2, 64, 3)).astype(np.float32)
    got = np.asarray(pc.farthest_point_sample(jnp.asarray(xyz), 8))
    assert (got[:, 0] == 0).all()


def test_fps_spread():
    """FPS should cover the cloud better than the first-k points."""
    rng = np.random.default_rng(4)
    xyz = rng.normal(size=(1, 512, 3)).astype(np.float32)
    idx = np.asarray(pc.farthest_point_sample_ref(jnp.asarray(xyz), 32))[0]
    sel = xyz[0, idx]
    # chamfer-ish coverage: max distance from any point to nearest selected
    d = np.linalg.norm(xyz[0][:, None] - sel[None], axis=-1).min(-1).max()
    d_naive = np.linalg.norm(
        xyz[0][:, None] - xyz[0, :32][None], axis=-1).min(-1).max()
    assert d < d_naive


def test_ball_query_matches_numpy():
    rng = np.random.default_rng(5)
    xyz = rng.uniform(size=(2, 128, 3)).astype(np.float32)
    new_xyz = xyz[:, :16]
    for radius, nsample in [(0.1, 8), (0.3, 16), (0.02, 4)]:
        got = np.asarray(pc.ball_query(radius, nsample, jnp.asarray(xyz),
                                       jnp.asarray(new_xyz)))
        want = ball_query_numpy(radius, nsample, xyz, new_xyz)
        np.testing.assert_array_equal(got, want)


def test_ball_query_pallas_matches_ref():
    """The Pallas ball-query kernel (interpret mode on CPU) is bit-exact
    against the XLA oracle, incl. unaligned N/M and empty balls."""
    from genpose_tpu.ops.ball_query_pallas import ball_query_pallas

    rng = np.random.default_rng(7)
    for (B, N, M), (radius, nsample) in [
        ((2, 128, 16), (0.1, 8)),
        ((1, 100, 9), (0.3, 16)),     # unaligned N and M
        ((3, 257, 40), (0.02, 4)),    # mostly-empty balls
    ]:
        xyz = rng.uniform(size=(B, N, 3)).astype(np.float32)
        new_xyz = xyz[:, :M] + rng.normal(size=(B, M, 3)).astype(np.float32) * 0.01
        got = np.asarray(ball_query_pallas(radius, nsample, jnp.asarray(xyz),
                                           jnp.asarray(new_xyz)))
        want = np.asarray(pc.ball_query_ref(radius, nsample, jnp.asarray(xyz),
                                            jnp.asarray(new_xyz)))
        np.testing.assert_array_equal(got, want)


def test_ball_query_empty_ball_is_zero():
    """No point in radius -> all-zero row (CUDA zero-init)."""
    xyz = jnp.asarray(np.array([[[10.0, 10, 10], [20, 20, 20]]], np.float32))
    new_xyz = jnp.asarray(np.zeros((1, 1, 3), np.float32))
    got = np.asarray(pc.ball_query(0.5, 4, xyz, new_xyz))
    np.testing.assert_array_equal(got, np.zeros((1, 1, 4), np.int32))


def test_ball_query_first_hit_padding():
    """Fewer hits than nsample -> pad with the FIRST hit, not zero."""
    xyz = np.zeros((1, 10, 3), np.float32) + 100.0
    xyz[0, 3] = [0.0, 0, 0]
    xyz[0, 7] = [0.01, 0, 0]
    new_xyz = np.zeros((1, 1, 3), np.float32)
    got = np.asarray(pc.ball_query(0.5, 6, jnp.asarray(xyz), jnp.asarray(new_xyz)))[0, 0]
    np.testing.assert_array_equal(got, [3, 7, 3, 3, 3, 3])


def test_gather_and_group():
    rng = np.random.default_rng(6)
    feats = rng.normal(size=(2, 32, 5)).astype(np.float32)
    idx = rng.integers(0, 32, size=(2, 7)).astype(np.int32)
    got = np.asarray(pc.gather_points(jnp.asarray(feats), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], feats[b, idx[b]])

    gidx = rng.integers(0, 32, size=(2, 7, 4)).astype(np.int32)
    gg = np.asarray(pc.group_points(jnp.asarray(feats), jnp.asarray(gidx)))
    for b in range(2):
        for m in range(7):
            np.testing.assert_array_equal(gg[b, m], feats[b, gidx[b, m]])


def test_gather_backward_is_scatter_add():
    """Autodiff through gather must scatter-add like the CUDA backward."""
    import jax
    feats = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 6, 2))
    idx = jnp.asarray(np.array([[0, 0, 3]], np.int32))

    def loss(f):
        return jnp.sum(pc.gather_points(f, idx))

    g = np.asarray(jax.grad(loss)(feats))[0]
    expected = np.zeros((6, 2))
    expected[0] = 2.0  # gathered twice
    expected[3] = 1.0
    np.testing.assert_array_equal(g, expected)


def test_three_nn_and_interpolate():
    rng = np.random.default_rng(7)
    unknown = rng.normal(size=(1, 20, 3)).astype(np.float32)
    known = rng.normal(size=(1, 8, 3)).astype(np.float32)
    dist, idx = pc.three_nn(jnp.asarray(unknown), jnp.asarray(known))
    dist, idx = np.asarray(dist), np.asarray(idx)
    # oracle
    d_full = np.linalg.norm(unknown[0][:, None] - known[0][None], axis=-1)
    order = np.argsort(d_full, axis=-1)[:, :3]
    np.testing.assert_allclose(np.sort(dist[0], -1), np.sort(
        np.take_along_axis(d_full, order, -1), -1), atol=1e-4)
    assert set(map(tuple, np.sort(idx[0], -1))) == set(map(tuple, np.sort(order, -1)))

    feats = rng.normal(size=(1, 8, 4)).astype(np.float32)
    w = 1.0 / (dist + 1e-8)
    w = w / w.sum(-1, keepdims=True)
    out = np.asarray(pc.three_interpolate(jnp.asarray(feats), jnp.asarray(idx),
                                          jnp.asarray(w)))
    want = np.einsum("nk,nkc->nc", w[0], feats[0][idx[0]])
    np.testing.assert_allclose(out[0], want, atol=1e-5)


def test_one_hot_gather_exact_and_differentiable():
    """The TPU gather path (one-hot einsum) is bit-exact vs take_along_axis
    and its autodiff backward equals the scatter-add of the XLA gather."""
    import jax
    import jax.numpy as jnp
    from genpose_tpu.ops.pointcloud import one_hot_gather

    rng = np.random.default_rng(11)
    pts = jnp.asarray(rng.normal(size=(3, 200, 7)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 200, size=(3, 900)).astype(np.int32))
    want = jnp.take_along_axis(pts, idx[..., None], axis=1)
    got = one_hot_gather(pts, idx)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))

    g1 = jax.grad(lambda p: jnp.sum(jnp.sin(one_hot_gather(p, idx))))(pts)
    g2 = jax.grad(lambda p: jnp.sum(jnp.sin(
        jnp.take_along_axis(p, idx[..., None], axis=1))))(pts)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_one_hot_gather_chunked_path():
    """M large enough to trigger the scan-chunked branch."""
    import jax.numpy as jnp
    from genpose_tpu.ops import pointcloud as pc

    rng = np.random.default_rng(12)
    pts = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 64, size=(2, 256)).astype(np.int32))
    import unittest.mock as mock
    # shrink the chunk threshold so chunking actually engages at test sizes
    # (2*256*64*4B = 128 KiB one-hot; the production threshold is 2 GiB)
    with mock.patch.object(pc, "_OH_CHUNK_BYTES", 16 * 1024):
        got = pc.one_hot_gather(pts, idx)
    want = jnp.take_along_axis(pts, idx[..., None], axis=1)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_fast_bwd_gather_forward_identical_and_grad_matches():
    """_row_gather_fast_bwd: forward bit-equals _row_gather; the custom
    single-pass scatter-add backward matches autodiff (exactly on CPU,
    where einsum precision is moot), including duplicate-index
    accumulation (the CUDA atomicAdd semantics, group_points_gpu.cu:8-44)."""
    import jax

    rng = np.random.default_rng(5)
    pts = jnp.asarray(rng.normal(size=(2, 32, 5)).astype(np.float32))
    # duplicates on purpose: index 3 repeated
    idx = jnp.asarray(np.array([[0, 3, 3, 7, 31, 3], [1, 1, 2, 2, 2, 0]],
                               dtype=np.int32))

    out_fast = pc._row_gather_fast_bwd(pts, idx, None)
    out_ref = pc._row_gather(pts, idx, None)
    np.testing.assert_array_equal(np.asarray(out_fast), np.asarray(out_ref))

    f_fast = lambda p: jnp.sum(jnp.sin(pc._row_gather_fast_bwd(p, idx, None)))
    f_ref = lambda p: jnp.sum(jnp.sin(pc._row_gather(p, idx, None)))
    g_fast = jax.grad(f_fast)(pts)
    g_ref = jax.grad(f_ref)(pts)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)


def test_fast_bwd_gather_chunked_scatter():
    """The chunked backward path accumulates across chunks correctly."""
    import unittest.mock as mock

    import jax

    rng = np.random.default_rng(6)
    pts = jnp.asarray(rng.normal(size=(1, 16, 4)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 16, size=(1, 8)).astype(np.int32))

    f = lambda p: jnp.sum(pc._row_gather_fast_bwd(p, idx, None) ** 2)
    g_ref = jax.grad(lambda p: jnp.sum(pc._row_gather(p, idx, None) ** 2))(pts)
    # force the chunk loop by shrinking the threshold
    with mock.patch.object(pc, "_OH_CHUNK_BYTES", 64):
        g_fast = jax.grad(f)(pts)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)


def test_gather_grad_config_wires_fast_bwd():
    """cfg.gather_grad='fast' reaches the encoder module tree."""
    from genpose_tpu.config import Config
    from genpose_tpu.training.agent import PoseAgent

    cfg = Config(num_points=32, batch_size=2, gather_grad="fast")
    agent = PoseAgent(cfg, "score", steps_per_epoch=2)
    assert agent.model.fast_grad_gathers is True
    assert Config(num_points=32).gather_grad == "fast"  # validated default (BASELINE r3)


def test_gather_fwd_config_wires_fast_fwd():
    """cfg.gather_fwd='fast' reaches the encoder module tree; the knob is
    train-only by construction (the SA module applies it only when
    train=True) and defaults to 'fast' (validated on-chip, BASELINE r3)."""
    from genpose_tpu.config import Config
    from genpose_tpu.training.agent import PoseAgent

    cfg = Config(num_points=32, batch_size=2, gather_fwd="fast")
    agent = PoseAgent(cfg, "score", steps_per_epoch=2)
    assert agent.model.fast_fwd_gathers is True
    assert Config(num_points=32).gather_fwd == "fast"  # validated default (BASELINE r3)

    # eval-mode forward is bit-identical with the knob on: precision only
    # changes under train=True (and only on the TPU one-hot lowering)
    import jax

    pts = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 3)).astype(np.float32))
    exact_agent = PoseAgent(
        Config(num_points=32, batch_size=2, gather_fwd="exact"), "score",
        steps_per_epoch=2)
    f_fast = agent.model.apply(
        {"params": exact_agent.state.params,
         "batch_stats": exact_agent.state.batch_stats},
        pts, train=False, method=type(agent.model).encode_pts)
    f_exact = exact_agent.model.apply(
        {"params": exact_agent.state.params,
         "batch_stats": exact_agent.state.batch_stats},
        pts, train=False, method=type(exact_agent.model).encode_pts)
    np.testing.assert_array_equal(np.asarray(f_fast), np.asarray(f_exact))


def test_fps_bq_fused_matches_components():
    """The fused FPS+ball-query kernel (round-5 exploration, VERDICT r4 #7)
    is bit-identical to fps -> gather centers -> ball_query per radius at
    the MSG stage shapes (s0 1024->512 with the two s0 radii, and the s2
    256->128 shape), including first-hit padding and empty balls."""
    from genpose_tpu.ops.fps_bq_fused import fps_bq_fused
    from genpose_tpu.ops.pointcloud import (
        ball_query,
        farthest_point_sample,
        gather_points,
    )

    rng = np.random.RandomState(11)
    # shapes shrunk for interpret mode (the kernel loops M sequential
    # rounds in python there); the real-shape A/B runs on chip via
    # tools/bench_fused_geometry.py
    for B, N, M, radii, nsamples in (
        (4, 512, 256, (0.02, 0.04), (16, 32)),
        (3, 256, 128, (0.08, 0.16), (16, 32)),
        (2, 100, 64, (0.3,), (8,)),   # unaligned N, big radius, one radius
    ):
        pts = (rng.randn(B, N, 3) * 0.1).astype(np.float32)
        xyz = jnp.asarray(pts)
        fps_idx, bq = fps_bq_fused(xyz, M, radii, nsamples)
        ref_idx = farthest_point_sample(xyz, M)
        np.testing.assert_array_equal(np.asarray(fps_idx),
                                      np.asarray(ref_idx))
        centers = gather_points(xyz, ref_idx)
        for i, (r, s) in enumerate(zip(radii, nsamples)):
            ref_bq = ball_query(r, s, xyz, centers)
            np.testing.assert_array_equal(
                np.asarray(bq[i]), np.asarray(ref_bq),
                err_msg=f"radius {r} nsample {s} (B={B}, N={N}, M={M})")
