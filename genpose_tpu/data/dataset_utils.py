"""Host-side 2D dataset utilities (numpy / cv2).

Re-implements reference ``utils/datasets_utils.py`` (coord maps, DZI bbox
jitter, affine crop) and the two image helpers from ``utils/sgpa_utils.py``
(``load_depth:194-211``, ``get_bbox:214-242``).  These run in data-loader
worker threads — they never touch the device.
"""

from __future__ import annotations

import functools

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is baked into the image
    cv2 = None


@functools.lru_cache(maxsize=8)
def _coord_map_cached(width: int, height: int, fmt: str) -> np.ndarray:
    x = np.linspace(0, width - 1, width, dtype=np.float32)
    y = np.linspace(0, height - 1, height, dtype=np.float32)
    xy = np.asarray(np.meshgrid(x, y))
    if fmt == "HWC":
        xy = xy.transpose(1, 2, 0)
    elif fmt != "CHW":
        raise ValueError(f"Unknown format: {fmt}")
    xy.setflags(write=False)  # shared across loader workers
    return xy


def get_2d_coord_np(width: int, height: int, fmt: str = "CHW") -> np.ndarray:
    """Pixel-coordinate map (ref ``datasets_utils.py:4-22``).

    Cached per (width, height): it is a constant the dataset was rebuilding
    for every sample (~5% of per-sample host cost, tools/bench_loader.py).
    Returned read-only; callers warp/slice it, never write."""
    return _coord_map_cached(width, height, fmt)


def aug_bbox_DZI(dzi_params, bbox_xyxy, im_H, im_W, rng: np.random.Generator):
    """Dynamic-zoom-in bbox jitter (ref ``datasets_utils.py:25-62``).

    dzi_params: DynamicZoomInConfig-like (pad_scale/dzi_type/scale_ratio/
    shift_ratio).  Takes an explicit rng for reproducibility.
    """
    x1, y1, x2, y2 = np.asarray(bbox_xyxy, dtype=np.float64).copy()
    cx, cy = 0.5 * (x1 + x2), 0.5 * (y1 + y2)
    bh, bw = y2 - y1, x2 - x1
    dzi_type = dzi_params.dzi_type.lower()
    if dzi_type == "uniform":
        scale_ratio = 1 + dzi_params.scale_ratio * (2 * rng.random() - 1)
        shift_ratio = dzi_params.shift_ratio * (2 * rng.random(2) - 1)
        bbox_center = np.array([cx + bw * shift_ratio[0], cy + bh * shift_ratio[1]])
        scale = max(y2 - y1, x2 - x1) * scale_ratio * dzi_params.pad_scale
    elif dzi_type == "roi10d":
        _a, _b = -0.15, 0.15
        x1 += bw * (rng.random() * (_b - _a) + _a)
        x2 += bw * (rng.random() * (_b - _a) + _a)
        y1 += bh * (rng.random() * (_b - _a) + _a)
        y2 += bh * (rng.random() * (_b - _a) + _a)
        x1, x2 = np.clip([x1, x2], 0, im_W)
        y1, y2 = np.clip([y1, y2], 0, im_H)
        bbox_center = np.array([0.5 * (x1 + x2), 0.5 * (y1 + y2)])
        scale = max(y2 - y1, x2 - x1) * dzi_params.pad_scale
    else:
        bbox_center = np.array([cx, cy])
        scale = max(y2 - y1, x2 - x1)
    scale = min(scale, max(im_H, im_W)) * 1.0
    return bbox_center, scale


def aug_bbox_eval(bbox_xyxy, im_H, im_W):
    """Deterministic eval-time square bbox (ref ``datasets_utils.py:65-80``)."""
    x1, y1, x2, y2 = np.asarray(bbox_xyxy, dtype=np.float64)
    bbox_center = np.array([0.5 * (x1 + x2), 0.5 * (y1 + y2)])
    scale = max(y2 - y1, x2 - x1)
    scale = min(scale, max(im_H, im_W)) * 1.0
    return bbox_center, scale


def _get_dir(src_point, rot_rad):
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    return [
        src_point[0] * cs - src_point[1] * sn,
        src_point[0] * sn + src_point[1] * cs,
    ]


def _get_3rd_point(a, b):
    direct = a - b
    return b + np.array([-direct[1], direct[0]], dtype=np.float32)


def get_affine_transform(center, scale, rot, output_size,
                         shift=np.array([0, 0], dtype=np.float32), inv=False):
    """CenterNet-style crop transform (ref ``datasets_utils.py:97-138``)."""
    center = np.asarray(center, dtype=np.float32)
    if isinstance(scale, (int, float)):
        scale = np.array([scale, scale], dtype=np.float32)
    if isinstance(output_size, (int, float)):
        output_size = (output_size, output_size)

    src_w = scale[0]
    dst_w, dst_h = output_size

    rot_rad = np.pi * rot / 180
    src_dir = _get_dir([0, src_w * -0.5], rot_rad)
    dst_dir = np.array([0, dst_w * -0.5], np.float32)

    src = np.zeros((3, 2), dtype=np.float32)
    dst = np.zeros((3, 2), dtype=np.float32)
    src[0, :] = center + scale * shift
    src[1, :] = center + src_dir + scale * shift
    dst[0, :] = [dst_w * 0.5, dst_h * 0.5]
    dst[1, :] = np.array([dst_w * 0.5, dst_h * 0.5], np.float32) + dst_dir
    src[2:, :] = _get_3rd_point(src[0, :], src[1, :])
    dst[2:, :] = _get_3rd_point(dst[0, :], dst[1, :])

    if inv:
        return cv2.getAffineTransform(np.float32(dst), np.float32(src))
    return cv2.getAffineTransform(np.float32(src), np.float32(dst))


def crop_resize_by_warp_affine(img, center, scale, output_size, rot=0,
                               interpolation=None):
    """Square crop + resize (ref ``datasets_utils.py:82-95``)."""
    if interpolation is None:
        interpolation = cv2.INTER_LINEAR
    if isinstance(scale, (int, float)):
        scale = (scale, scale)
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    trans = get_affine_transform(center, scale, rot, output_size)
    return cv2.warpAffine(img, trans, (int(output_size[0]), int(output_size[1])),
                          flags=interpolation)


def load_depth(img_path: str) -> np.ndarray:
    """16-bit depth decode (ref ``sgpa_utils.py:194-211``)."""
    depth_path = img_path if img_path.endswith(".png") else img_path + "_depth.png"
    depth = cv2.imread(depth_path, -1)
    if depth is None:
        raise FileNotFoundError(depth_path)
    if len(depth.shape) == 3:
        depth16 = depth[:, :, 1] * 256 + depth[:, :, 2]
        depth16 = np.where(depth16 == 32001, 0, depth16)
        depth16 = depth16.astype(np.uint16)
    elif len(depth.shape) == 2 and depth.dtype == np.uint16:
        depth16 = depth
    else:
        raise ValueError("[ Error ]: Unsupported depth type.")
    return depth16


def get_bbox(bbox, img_width: int = 480, img_length: int = 640):
    """Square crop window snapped to 40px multiples (ref ``sgpa_utils.py:214-242``)."""
    y1, x1, y2, x2 = bbox
    window_size = (max(y2 - y1, x2 - x1) // 40 + 1) * 40
    window_size = min(window_size, 440)
    center = [(y1 + y2) // 2, (x1 + x2) // 2]
    rmin = center[0] - int(window_size / 2)
    rmax = center[0] + int(window_size / 2)
    cmin = center[1] - int(window_size / 2)
    cmax = center[1] + int(window_size / 2)
    if rmin < 0:
        rmax += -rmin
        rmin = 0
    if cmin < 0:
        cmax += -cmin
        cmin = 0
    if rmax > img_width:
        rmin -= rmax - img_width
        rmax = img_width
    if cmax > img_length:
        cmin -= cmax - img_length
        cmax = img_length
    return rmin, rmax, cmin, cmax


def depth_to_pcl(depth, K, xymap, mask) -> np.ndarray:
    """Back-project masked depth to a camera-frame point cloud
    (ref ``datasets_genpose.py:386-397``).  Units follow the input depth."""
    K = np.asarray(K).reshape(-1)
    cx, cy, fx, fy = K[2], K[5], K[0], K[4]
    depth = depth.reshape(-1).astype(np.float32)
    valid = ((depth > 0) * mask.reshape(-1)) > 0
    depth = depth[valid]
    x_map = xymap[0].reshape(-1)[valid]
    y_map = xymap[1].reshape(-1)[valid]
    real_x = (x_map - cx) * depth / fx
    real_y = (y_map - cy) * depth / fy
    return np.stack((real_x, real_y, depth), axis=-1).astype(np.float32)


def sample_points(pcl: np.ndarray, n_pts: int, rng: np.random.Generator) -> np.ndarray:
    """Random down/duplicate-sample to exactly n_pts
    (ref ``datasets_genpose.py:370-383``)."""
    total = pcl.shape[0]
    if total == 0:  # degenerate cloud: zeros (matches the native path)
        return np.zeros((n_pts, 3), dtype=np.float32)
    if total < n_pts:
        pcl = np.concatenate(
            [np.tile(pcl, (n_pts // total, 1)), pcl[: n_pts % total]], axis=0
        )
    elif total > n_pts:
        ids = rng.permutation(total)[:n_pts]
        pcl = pcl[ids]
    return pcl


def backproject_and_sample(depth, K, xymap, mask, n_pts: int,
                           rng: np.random.Generator,
                           scale: float = 1.0):
    """Fused masked back-projection + sampling for the per-instance hot path.

    Dispatches to the native C++ kernel (``genpose_tpu/native``) when it is
    available — a single GIL-releasing pass replacing the reference's
    DataLoader-worker numpy chain (``datasets_genpose.py:370-397``) — and
    falls back to :func:`depth_to_pcl` + :func:`sample_points` otherwise.

    Returns ``(n_valid, pcl)`` where pcl is ``(n_pts, 3)`` float32; callers
    apply their own minimum-point cutoff on ``n_valid``.
    """
    from genpose_tpu import native

    if native.available():
        Kf = np.asarray(K).reshape(-1)
        seed = int(rng.integers(0, 2**63 - 1))
        n_valid, pcl = native.backproject_sample(
            depth, mask, xymap[0], xymap[1],
            fx=Kf[0], fy=Kf[4], cx=Kf[2], cy=Kf[5],
            scale=scale, n_pts=n_pts, seed=seed)
        return n_valid, pcl
    pcl = depth_to_pcl(depth, K, xymap, mask) * scale
    n_valid = pcl.shape[0]
    if n_valid == 0:
        return 0, np.zeros((n_pts, 3), dtype=np.float32)
    return n_valid, sample_points(pcl, n_pts, rng)


def defor_2D(roi_mask, rng: np.random.Generator, rand_r=2, rand_pro=0.3):
    """Random mask erode/dilate boundary noise (ref ``data_augmentation.py:10-33``)."""
    roi_mask = roi_mask.copy().squeeze()
    if rng.random() > rand_pro:
        return roi_mask
    mask = roi_mask.copy()
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (2, 2))
    mask_erode = cv2.erode(mask, kernel, rand_r)
    mask_dilate = cv2.dilate(mask, kernel, rand_r)
    change_list = roi_mask[mask_erode != mask_dilate]
    if change_list.size < 1:
        return roi_mask
    choose = rng.choice(change_list.size, change_list.size // 2, replace=False)
    change_list = np.ones_like(change_list)
    change_list[choose] = 0.0
    roi_mask[mask_erode != mask_dilate] = change_list
    roi_mask[roi_mask > 0.0] = 1.0
    return roi_mask
