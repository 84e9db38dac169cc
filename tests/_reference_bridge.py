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


def install_stubs() -> None:
    ipdb = _ensure("ipdb")
    if not hasattr(ipdb, "set_trace"):
        ipdb.set_trace = lambda *a, **k: None

    _ensure("pointnet2_cuda")  # never called: we only read parameters

    tv = _ensure("torchvision")
    tvu = _ensure("torchvision.utils")
    tvu.save_image = lambda *a, **k: None
    tvu.make_grid = lambda *a, **k: None
    tv.utils = tvu

    p3d = _ensure("pytorch3d")
    p3d.io = _ensure("pytorch3d.io")
    p3d.transforms = _make_transforms()


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
