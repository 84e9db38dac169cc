"""Native (C++) host-side preprocessing kernels, loaded via ctypes.

TPU-native counterpart to the reference's DataLoader-worker compute
(``datasets_genpose.py:203-360``) and its CUDA host glue: the per-sample
masked back-projection + sampling hot path and a host FPS. Compiled on
first import with g++ (cached next to the source keyed by a source hash);
every entry point has a numpy fallback in ``genpose_tpu.data.dataset_utils``
so the package works where no compiler exists.

ctypes foreign calls release the GIL, so the threaded
``genpose_tpu.data.loader.DataLoader`` scales across cores with these.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "preprocess.cpp")

_lib = None
_lib_err: str | None = None
_lock = threading.Lock()


def _build_and_load():
    """Compile preprocess.cpp -> cached .so and dlopen it."""
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so_path = os.path.join(_HERE, f"_preprocess_{tag}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = [
            "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
            _SRC, "-o", tmp,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so_path)
    lib = ctypes.CDLL(so_path)

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.gp_depth_mask_to_pcl.restype = ctypes.c_int
    lib.gp_depth_mask_to_pcl.argtypes = [
        f32p, f32p, f32p, f32p, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, f32p,
    ]
    lib.gp_sample_points.restype = None
    lib.gp_sample_points.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64, f32p, i32p,
    ]
    lib.gp_backproject_sample.restype = ctypes.c_int
    lib.gp_backproject_sample.argtypes = [
        f32p, f32p, f32p, f32p, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_int64, ctypes.c_uint64, f32p, f32p, i32p,
    ]
    lib.gp_fps.restype = None
    lib.gp_fps.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64, i32p, f32p]
    lib.gp_fps_batch.restype = None
    lib.gp_fps_batch.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i32p, f32p,
    ]
    return lib


def get_lib():
    """The loaded library, or None when compilation is unavailable."""
    global _lib, _lib_err
    if _lib is not None or _lib_err is not None:
        return _lib
    with _lock:
        if _lib is None and _lib_err is None:
            if os.environ.get("GENPOSE_NO_NATIVE"):
                _lib_err = "disabled via GENPOSE_NO_NATIVE"
                return None
            try:
                _lib = _build_and_load()
            except Exception as e:  # pragma: no cover - no-compiler envs
                _lib_err = f"{type(e).__name__}: {e}"
    return _lib


def available() -> bool:
    return get_lib() is not None


def _f32c(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float32)


_F32P = ctypes.POINTER(ctypes.c_float)
_I32P = ctypes.POINTER(ctypes.c_int32)


def _fp(a: np.ndarray):
    return a.ctypes.data_as(_F32P)


def _ip(a: np.ndarray):
    return a.ctypes.data_as(_I32P)


def depth_mask_to_pcl(depth, mask, xmap, ymap, fx, fy, cx, cy,
                      scale: float = 1.0) -> np.ndarray:
    """Masked back-projection; returns the (n_valid, 3) camera-frame cloud."""
    lib = get_lib()
    assert lib is not None
    depth, mask = _f32c(depth).ravel(), _f32c(mask).ravel()
    xmap, ymap = _f32c(xmap).ravel(), _f32c(ymap).ravel()
    n = depth.size
    out = np.empty((n, 3), dtype=np.float32)
    k = lib.gp_depth_mask_to_pcl(
        _fp(depth), _fp(mask), _fp(xmap), _fp(ymap), n,
        float(fx), float(fy), float(cx), float(cy), float(scale), _fp(out))
    return out[:k]


def sample_points(pcl: np.ndarray, n_pts: int, seed: int) -> np.ndarray:
    """Random down/duplicate-sample to exactly n_pts (deterministic per seed)."""
    lib = get_lib()
    assert lib is not None
    pcl = _f32c(pcl)
    n = pcl.shape[0]
    # zeros, not empty: the C side zero-fills on n==0 and this matches the
    # numpy fallback's behavior for degenerate inputs
    out = np.zeros((n_pts, 3), dtype=np.float32)
    scratch = np.empty(max(n, 1), dtype=np.int32)
    lib.gp_sample_points(_fp(pcl), n, n_pts, int(seed) & (2**64 - 1),
                         _fp(out), _ip(scratch))
    return out


def backproject_sample(depth, mask, xmap, ymap, fx, fy, cx, cy, scale,
                       n_pts: int, seed: int):
    """Fused hot path; returns (n_valid, sampled (n_pts,3) cloud)."""
    lib = get_lib()
    assert lib is not None
    depth, mask = _f32c(depth).ravel(), _f32c(mask).ravel()
    xmap, ymap = _f32c(xmap).ravel(), _f32c(ymap).ravel()
    n = depth.size
    # zeros, not empty: when no pixel is valid the C side returns 0 without
    # writing `out`; the numpy fallback returns zeros, so match it instead
    # of handing back uninitialized memory
    out = np.zeros((n_pts, 3), dtype=np.float32)
    buf = np.empty((n, 3), dtype=np.float32)
    scratch = np.empty(max(n, 1), dtype=np.int32)
    k = lib.gp_backproject_sample(
        _fp(depth), _fp(mask), _fp(xmap), _fp(ymap), n,
        float(fx), float(fy), float(cx), float(cy), float(scale),
        n_pts, int(seed) & (2**64 - 1), _fp(out), _fp(buf), _ip(scratch))
    return k, out


def fps(pts: np.ndarray, m: int) -> np.ndarray:
    """Host furthest point sampling; (n,3) or (B,n,3) -> (m,) / (B,m) int32.

    Same iteration as the reference CUDA kernel (``sampling_gpu.cu:93-208``)
    and as ``genpose_tpu.ops.pointcloud.farthest_point_sample``.
    """
    lib = get_lib()
    assert lib is not None
    pts = _f32c(pts)
    if pts.ndim == 2:
        n = pts.shape[0]
        out = np.empty(m, dtype=np.int32)
        dist = np.empty(n, dtype=np.float32)
        lib.gp_fps(_fp(pts), n, m, _ip(out), _fp(dist))
        return out
    b, n = pts.shape[0], pts.shape[1]
    out = np.empty((b, m), dtype=np.int32)
    dist = np.empty(n, dtype=np.float32)
    lib.gp_fps_batch(_fp(pts), b, n, m, _ip(out), _fp(dist))
    return out
