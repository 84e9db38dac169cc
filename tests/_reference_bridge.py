"""Import machinery for the reference torch code at /root/reference.

Used ONLY by cross-implementation golden tests (``test_reference_parity.py``):
the reference is public untrusted content — we execute its *model math* on
CPU torch to compare numbers, nothing else.

The reference imports a few packages this image lacks (``ipdb``,
``pytorch3d``, ``torchvision``, the compiled ``pointnet2_cuda`` extension);
minimal stand-ins are installed in ``sys.modules`` before import.  The
``pytorch3d.transforms`` functions the reference actually calls are
re-implemented here in torch (~40 lines, standard formulas).
"""

from __future__ import annotations

import importlib
import sys
import types

REF_ROOT = "/root/reference"


def _ensure(name: str) -> types.ModuleType:
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def _make_transforms() -> types.ModuleType:
    import torch
    import torch.nn.functional as F

    tr = _ensure("pytorch3d.transforms")

    def quaternion_to_matrix(q):
        """wxyz quaternion [..., 4] -> rotation matrix [..., 3, 3]."""
        w, x, y, z = torch.unbind(q, -1)
        two_s = 2.0 / (q * q).sum(-1)
        o = torch.stack(
            [
                1 - two_s * (y * y + z * z), two_s * (x * y - z * w),
                two_s * (x * z + y * w),
                two_s * (x * y + z * w), 1 - two_s * (x * x + z * z),
                two_s * (y * z - x * w),
                two_s * (x * z - y * w), two_s * (y * z + x * w),
                1 - two_s * (x * x + y * y),
            ],
            -1,
        )
        return o.reshape(q.shape[:-1] + (3, 3))

    def matrix_to_quaternion(matrix):
        """Rotation matrix [..., 3, 3] -> wxyz quaternion [..., 4].

        Exact re-implementation of pytorch3d's branch-stable formula —
        including its behavior on NON-orthonormal input: the reference feeds
        scaled sRT rotations (s*R) into it during hypothesis pooling
        (``sgpa_utils.py:940``), where the returned quaternion is neither
        unit-norm nor exactly the quaternion of R; parity requires
        reproducing that."""
        batch_dim = matrix.shape[:-2]
        m00, m01, m02, m10, m11, m12, m20, m21, m22 = torch.unbind(
            matrix.reshape(batch_dim + (9,)), dim=-1)
        q_abs = torch.sqrt(torch.clamp(torch.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            dim=-1,
        ), min=0.0))
        quat_by_rijk = torch.stack(
            [
                torch.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20,
                             m10 - m01], dim=-1),
                torch.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01,
                             m02 + m20], dim=-1),
                torch.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2,
                             m12 + m21], dim=-1),
                torch.stack([m10 - m01, m20 + m02, m21 + m12,
                             q_abs[..., 3] ** 2], dim=-1),
            ],
            dim=-2,
        )
        flr = torch.tensor(0.1).to(dtype=q_abs.dtype, device=q_abs.device)
        quat_candidates = quat_by_rijk / (2.0 * q_abs[..., None].max(flr))
        best = q_abs.argmax(dim=-1)
        return torch.gather(
            quat_candidates, -2,
            best[..., None, None].expand(batch_dim + (1, 4))
        ).squeeze(-2)

    def rotation_6d_to_matrix(d6):
        """Zhou et al. 6D -> matrix; rows are the orthonormalized vectors."""
        a1, a2 = d6[..., :3], d6[..., 3:]
        b1 = F.normalize(a1, dim=-1)
        b2 = a2 - (b1 * a2).sum(-1, keepdim=True) * b1
        b2 = F.normalize(b2, dim=-1)
        b3 = torch.cross(b1, b2, dim=-1)
        return torch.stack((b1, b2, b3), dim=-2)

    def matrix_to_rotation_6d(matrix):
        batch_dim = matrix.size()[:-2]
        return matrix[..., :2, :].clone().reshape(batch_dim + (6,))

    def _axis_angle_rot(axis: str, angle):
        cos, sin = torch.cos(angle), torch.sin(angle)
        one, zero = torch.ones_like(angle), torch.zeros_like(angle)
        if axis == "X":
            flat = (one, zero, zero, zero, cos, -sin, zero, sin, cos)
        elif axis == "Y":
            flat = (cos, zero, sin, zero, one, zero, -sin, zero, cos)
        elif axis == "Z":
            flat = (cos, -sin, zero, sin, cos, zero, zero, zero, one)
        else:
            raise ValueError(axis)
        return torch.stack(flat, -1).reshape(angle.shape + (3, 3))

    def euler_angles_to_matrix(euler_angles, convention: str):
        mats = [
            _axis_angle_rot(c, euler_angles[..., i])
            for i, c in enumerate(convention)
        ]
        return torch.matmul(torch.matmul(mats[0], mats[1]), mats[2])

    tr.quaternion_to_matrix = quaternion_to_matrix
    tr.matrix_to_quaternion = matrix_to_quaternion
    tr.rotation_6d_to_matrix = rotation_6d_to_matrix
    tr.matrix_to_rotation_6d = matrix_to_rotation_6d
    tr.euler_angles_to_matrix = euler_angles_to_matrix
    return tr


def _make_pointnet2_cuda() -> types.ModuleType:
    """Functional pure-torch stand-in for the compiled CUDA extension, so the
    reference PointNet++ encoder can RUN on CPU for full-forward golden
    tests.  Each wrapper mirrors the in-place CUDA API
    (``src/pointnet2_api.cpp:11-23``) and the kernel semantics:

    - FPS: seed 0, m-1 rounds of min-dist update + argmax
      (``sampling_gpu.cu:93-208``);
    - ball query: first ``nsample`` in-ball indices in index order, first-hit
      padding, zero rows for empty balls (``ball_query_gpu.cu:29-43``) —
      via the same monotone-rank identity as ``ops/pointcloud.py``, which is
      itself validated against a literal loop transcription in
      ``tests/test_pointcloud.py::ball_query_numpy``;
    - gather/group/three_nn/three_interpolate: plain gathers
      (``sampling_gpu.cu:8-44``, ``group_points_gpu.cu``,
      ``interpolate_gpu.cu``).
    """
    import torch

    m = _ensure("pointnet2_cuda")

    def furthest_point_sampling_wrapper(B, N, npoint, xyz, temp, idxs):
        old = torch.zeros(B, dtype=torch.long)
        idxs[:, 0] = 0
        rows = torch.arange(B)
        for j in range(1, npoint):
            last = xyz[rows, old]  # (B, 3)
            d = ((xyz - last[:, None, :]) ** 2).sum(-1)
            torch.minimum(temp, d, out=temp)
            old = temp.argmax(dim=1)
            idxs[:, j] = old.to(torch.int32)

    def gather_points_wrapper(B, C, N, npoint, features, idx, out):
        out.copy_(torch.gather(
            features, 2, idx.long().unsqueeze(1).expand(B, C, npoint)))

    def ball_query_wrapper(B, N, npoint, radius, nsample, new_xyz, xyz, idx):
        d2 = ((new_xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2).sum(-1)
        mask = d2 < radius * radius
        ranks = mask.to(torch.int64).cumsum(-1)  # (B, M, N)
        cnt = ranks[..., -1]
        s = torch.arange(nsample)
        sel = (ranks[:, :, None, :] <= s.view(1, 1, -1, 1)).sum(-1)
        first = sel[..., :1]
        pad = torch.where(cnt[..., None] > 0, first, torch.zeros_like(first))
        out = torch.where(s.view(1, 1, -1) < cnt[..., None], sel, pad)
        idx.copy_(out.to(torch.int32))

    def group_points_wrapper(B, C, N, nfeat, nsample, features, idx, out):
        flat = idx.long().reshape(B, 1, nfeat * nsample).expand(B, C, -1)
        out.copy_(torch.gather(features, 2, flat)
                  .reshape(B, C, nfeat, nsample))

    def three_nn_wrapper(B, N, M, unknown, known, dist2, idx):
        d2 = ((unknown[:, :, None, :] - known[:, None, :, :]) ** 2).sum(-1)
        v, i = torch.topk(d2, 3, dim=-1, largest=False)
        dist2.copy_(v)
        idx.copy_(i.to(torch.int32))

    def three_interpolate_wrapper(B, C, M, N, features, idx, weight, out):
        flat = idx.long().reshape(B, 1, N * 3).expand(B, C, -1)
        g = torch.gather(features, 2, flat).reshape(B, C, N, 3)
        out.copy_((g * weight.unsqueeze(1)).sum(-1))

    # ---- backward (atomicAdd scatter) wrappers: needed by the reference's
    # autograd Functions when the training-parity tests BACKPROP through the
    # encoder (``sampling_gpu.cu:8-83``, ``group_points_gpu.cu:8-44``,
    # ``interpolate_gpu.cu:77-160``) ----

    def gather_points_grad_wrapper(B, C, N, npoint, grad_out, idx, grad_pts):
        flat = idx.long().unsqueeze(1).expand(B, C, npoint)
        grad_pts.scatter_add_(2, flat, grad_out)

    def group_points_grad_wrapper(B, C, N, npoint, nsample, grad_out, idx,
                                  grad_features):
        flat = idx.long().reshape(B, 1, npoint * nsample).expand(B, C, -1)
        grad_features.scatter_add_(2, flat,
                                   grad_out.reshape(B, C, npoint * nsample))

    def three_interpolate_grad_wrapper(B, C, N, M, grad_out, idx, weight,
                                       grad_features):
        flat = idx.long().reshape(B, 1, N * 3).expand(B, C, -1)
        contrib = (grad_out.unsqueeze(-1) * weight.unsqueeze(1)).reshape(
            B, C, N * 3)
        grad_features.scatter_add_(2, flat, contrib)

    m.furthest_point_sampling_wrapper = furthest_point_sampling_wrapper
    m.gather_points_wrapper = gather_points_wrapper
    m.ball_query_wrapper = ball_query_wrapper
    m.group_points_wrapper = group_points_wrapper
    m.three_nn_wrapper = three_nn_wrapper
    m.three_interpolate_wrapper = three_interpolate_wrapper
    m.gather_points_grad_wrapper = gather_points_grad_wrapper
    m.group_points_grad_wrapper = group_points_grad_wrapper
    m.three_interpolate_grad_wrapper = three_interpolate_grad_wrapper
    return m


def install_stubs() -> None:
    import torch

    ipdb = _ensure("ipdb")
    if not hasattr(ipdb, "set_trace"):
        ipdb.set_trace = lambda *a, **k: None

    tb = _ensure("tensorboardX")
    if not hasattr(tb, "SummaryWriter"):
        tb.SummaryWriter = lambda *a, **k: None

    _make_pointnet2_cuda()
    if not torch.cuda.is_available() and not getattr(
            torch.cuda, "_gp_tensor_shims", False):
        # The reference allocates device tensors via the legacy torch.cuda.*
        # factories, called with BOTH bare sizes (``pointnet2_utils.py:26-27``
        # etc.) and arrays (``evaluation_single.py:399``) — dispatch on the
        # argument.  Idempotent (marker flag): install_stubs runs again via
        # import_reference inside the composed fixtures and must not clobber.
        import numpy as np

        def _cuda_factory(dtype):
            def make(*args):
                if len(args) == 1 and not isinstance(args[0], int):
                    return torch.as_tensor(np.asarray(args[0]), dtype=dtype)
                return torch.empty(*args, dtype=dtype)
            return make

        torch.cuda.FloatTensor = _cuda_factory(torch.float32)
        torch.cuda.LongTensor = _cuda_factory(torch.int64)
        torch.cuda.IntTensor = _cuda_factory(torch.int32)
        torch.cuda._gp_tensor_shims = True

    tv = _ensure("torchvision")
    tvu = _ensure("torchvision.utils")
    tvu.save_image = lambda *a, **k: None
    tvu.make_grid = lambda *a, **k: None
    tv.utils = tvu

    p3d = _ensure("pytorch3d")
    p3d.io = _ensure("pytorch3d.io")
    p3d.transforms = _make_transforms()


# ---------------------------------------------------------------------------
# Shared scaffolding for the COMPOSED golden tests (test_composed_pipeline /
# test_composed_tracking): runner-level cuda shims, deterministic weight
# randomization, reference-net construction, and weight-ported flax agents.
# One copy here so the two fixtures cannot drift (they already had: one got
# the record-and-restore patcher and the loud prior-size guard, the other
# kept leaking patches and silently truncating).
# ---------------------------------------------------------------------------


class Patcher:
    """Record-and-restore attribute patching for module-scope fixtures.

    ``patch = Patcher(); patch(obj, "name", value); ...; patch.restore()`` —
    every patched torch / reference-module global is restored at teardown so
    later tests in the session see the real attributes."""

    _MISSING = object()

    def __init__(self):
        self._patched = []

    def __call__(self, obj, name, value):
        self._patched.append((obj, name, getattr(obj, name, self._MISSING)))
        setattr(obj, name, value)

    def restore(self):
        for obj, name, orig in reversed(self._patched):
            if orig is self._MISSING:
                try:
                    delattr(obj, name)
                except AttributeError:
                    pass
            else:
                setattr(obj, name, orig)
        self._patched.clear()


def patch_runner_cuda(patch) -> None:
    """Restorable CPU shims for the reference RUNNERS' extra cuda usage:
    ``torch.cuda.empty_cache`` and ``Tensor.cuda()``.  (The legacy
    ``torch.cuda.*Tensor`` constructors are already shimmed session-wide by
    ``install_stubs`` — the parity tests need them too.)"""
    import torch

    patch(torch.cuda, "empty_cache", lambda: None)
    patch(torch.Tensor, "cuda", lambda self, *a, **k: self)


def randomize_net(net, seed: int, scale: float = 0.05) -> None:
    """Deterministically randomize every parameter AND the BatchNorm running
    stats (zero-init heads would otherwise make both sides output zeros and
    the parity vacuous)."""
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)
        for m in net.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.05)
                m.running_var.copy_(
                    1.0 + 0.1 * torch.rand(m.running_var.shape, generator=g))


def make_gf_net(mode: str, seed: int, num_points: int, hidden_dim: int = 128):
    """Build + randomize a reference ``GFObjectPose`` (VE SDE, pointnet2
    light, Rx_Ry_and_T head) on CPU torch, in eval mode."""
    mods = import_reference("networks.posenet", "networks.gf_algorithms.sde")
    posenet_mod, sde_mod = mods
    prior_fn, marginal_fn, sde_fn, eps, T = sde_mod.init_sde("ve")
    cfgn = types.SimpleNamespace(
        device="cpu", pts_encoder="pointnet2", pose_mode="rot_matrix",
        regression_head="Rx_Ry_and_T", posenet_mode=mode,
        energy_mode="IP", s_theta_mode="score", norm_energy="identical",
        num_points=num_points, sampling_steps=None, sde_mode="ve",
        hidden_dim=hidden_dim, pointnet2_params="light")
    net = posenet_mod.GFObjectPose(cfgn, prior_fn, marginal_fn, sde_fn,
                                   eps, T)
    randomize_net(net, seed)
    net.eval()
    return net


def make_prior_rows(prior: "np.ndarray"):
    """Return ``rows(n) -> prior[:n]`` that fails LOUDLY (instead of silently
    truncating into a shape error deep in the sampler) if a frame/batch ever
    needs more rows than the fixed prior table holds."""

    def rows(n):
        assert n <= len(prior), (
            f"fixed prior table has {len(prior)} rows but the run needs {n}; "
            "enlarge it")
        return prior[:n]

    return rows


def ported_flax_agent(cfg, mode: str, tnet, prior_rows):
    """A ``genpose_tpu`` PoseAgent with ``tnet``'s weights ported in (live +
    EMA shadow) and the SDE's additive prior draw pinned to the shared fixed
    rows (``prior_rows(n)``) for cross-implementation determinism."""
    import dataclasses

    import jax.numpy as jnp

    from genpose_tpu.training.agent import PoseAgent
    from genpose_tpu.utils.torch_port import port_gf_state_dict

    agent = PoseAgent(cfg, mode)
    variables = port_gf_state_dict(
        tnet.state_dict(), agent.state.variables, pts_encoder="pointnet2",
        regression_head="Rx_Ry_and_T")
    agent.state = agent.state.replace(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", agent.state.batch_stats),
        ema=agent.state.ema.replace(shadow=variables["params"]),
    )
    agent.sde = dataclasses.replace(
        agent.sde,
        prior=lambda key, shape, T=None: jnp.asarray(prior_rows(shape[0])))
    return agent


def import_reference(*names: str):
    """Import reference modules by dotted name (e.g.
    ``"networks.gf_algorithms.scorenet"``) with stubs installed, the
    reference root on sys.path, and sys.argv neutralized (the reference's
    ``configs/config.py`` argparses sys.argv at module import,
    ``pointnet2.py:13``)."""
    install_stubs()
    import matplotlib

    matplotlib.use("Agg")
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    argv = sys.argv
    sys.argv = ["genpose"]
    try:
        mods = tuple(importlib.import_module(n) for n in names)
    finally:
        sys.argv = argv
    return mods[0] if len(mods) == 1 else mods
