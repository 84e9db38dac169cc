"""Detection visualization: 3D bbox / coordinate-axis overlays on RGB frames.

Re-implements the NOCS-style drawing utilities of reference
``utils/sgpa_utils.py:1253-1463`` (align_rotation, 2D projections,
draw_bboxes, draw_coord_axis, draw_detections / draw_detections_with_error).
Host-side numpy/cv2 only.
"""

from __future__ import annotations

import os

import numpy as np

from genpose_tpu.eval.nocs_eval import get_3d_bbox, transform_coordinates_3d

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def get_3d_coord_axis() -> np.ndarray:
    """Origin + 0.1m x/y/z axis endpoints, [3, 4] (ref ``sgpa_utils.py:281``)."""
    return np.array([[0, 0, 0], [0, 0, 0.1], [0, 0.1, 0], [0.1, 0, 0]],
                    dtype=np.float64).transpose()


def calculate_2d_projections(coordinates_3d, intrinsics) -> np.ndarray:
    """[3, N] camera-frame points -> [N, 2] int pixel coords
    (ref ``sgpa_utils.py:1253-1268``)."""
    proj = intrinsics @ coordinates_3d
    proj = (proj[:2, :] / proj[2, :]).transpose()
    return np.array(proj, dtype=np.int32)


def align_rotation(sRT: np.ndarray) -> np.ndarray:
    """Rotate a symmetric object's pose so its x-z heading is canonical
    (ref ``sgpa_utils.py:1271-1290``)."""
    s = np.cbrt(np.linalg.det(sRT[:3, :3]))
    R = sRT[:3, :3] / s
    T = sRT[:3, 3]
    theta_x = R[0, 0] + R[2, 2]
    theta_y = R[0, 2] - R[2, 0]
    r_norm = np.sqrt(theta_x**2 + theta_y**2)
    s_map = np.array([
        [theta_x / r_norm, 0.0, -theta_y / r_norm],
        [0.0, 1.0, 0.0],
        [theta_y / r_norm, 0.0, theta_x / r_norm],
    ])
    aligned = np.identity(4, dtype=np.float32)
    aligned[:3, :3] = s * (R @ s_map)
    aligned[:3, 3] = T
    return aligned


def draw_bboxes(img, img_pts, color):
    """Wireframe box: dark ground layer, dimmer pillars, bright top
    (ref ``sgpa_utils.py:1325-1339``)."""
    img_pts = np.int32(img_pts).reshape(-1, 2)
    ground = tuple(int(c * 0.3) for c in color)
    for i, j in zip([4, 5, 6, 7], [5, 7, 4, 6]):
        img = cv2.line(img, tuple(img_pts[i]), tuple(img_pts[j]), ground, 2)
    pillar = tuple(int(c * 0.6) for c in color)
    for i, j in zip(range(4), range(4, 8)):
        img = cv2.line(img, tuple(img_pts[i]), tuple(img_pts[j]), pillar, 2)
    for i, j in zip([0, 1, 2, 3], [1, 3, 0, 2]):
        img = cv2.line(img, tuple(img_pts[i]), tuple(img_pts[j]), tuple(color), 2)
    return img


def draw_coord_axis(img, img_pts, correct: bool = True):
    """RGB axis triplet; all-blue when flagged incorrect
    (ref ``sgpa_utils.py:1293-1322``)."""
    img_pts = np.int32(img_pts).reshape(-1, 2)
    colors = ([(255, 0, 0), (0, 255, 0), (0, 0, 255)] if correct
              else [(0, 0, 255)] * 3)
    for k in range(3):
        img = cv2.line(img, tuple(img_pts[0]), tuple(img_pts[k + 1]),
                       colors[k], 2)
    return img


def _draw_group(img, sRT_all, size_all, class_ids, intrinsics, color,
                draw_bbox, draw_axis, flags=None):
    for i in range(sRT_all.shape[0]):
        sRT = (align_rotation(sRT_all[i]) if class_ids[i] in (1, 2, 4)
               else sRT_all[i])
        if draw_bbox:
            bbox_3d = get_3d_bbox(size_all[i], 0)
            proj = calculate_2d_projections(
                transform_coordinates_3d(bbox_3d, sRT), intrinsics)
            img = draw_bboxes(img, proj, color)
        if draw_axis:
            RT = sRT.copy()
            RT[:3, :3] = RT[:3, :3] / np.linalg.norm(RT[:3, 0])
            proj = calculate_2d_projections(
                transform_coordinates_3d(get_3d_coord_axis(), RT), intrinsics)
            img = draw_coord_axis(img, proj,
                                  correct=(flags[i] if flags is not None
                                           else True))
    return img


def draw_detections(img, out_dir, data_name, img_id, intrinsics,
                    pred_sRT, pred_size, pred_class_ids,
                    gt_sRT=None, gt_size=None, gt_class_ids=None,
                    nocs_sRT=None, nocs_size=None, nocs_class_ids=None,
                    draw_gt=True, draw_nocs=True, draw_pred=True,
                    draw_axis=True, draw_bbox=False, error_flags=None):
    """Overlay NOCS (blue boxes), GT (green) and predictions (red) on a frame
    and write ``{data_name}_{img_id}_pred.png``
    (ref ``sgpa_utils.py:1342-1404``; with ``error_flags`` given this is the
    ``draw_detections_with_error`` variant, 1406-1463)."""
    out_path = os.path.join(out_dir, f"{data_name}_{img_id}_pred.png")
    if draw_nocs and nocs_sRT is not None:
        for i in range(nocs_sRT.shape[0]):
            sRT = (align_rotation(nocs_sRT[i]) if nocs_class_ids[i] in (1, 2, 4)
                   else nocs_sRT[i])
            proj = calculate_2d_projections(
                transform_coordinates_3d(get_3d_bbox(nocs_size[i], 0), sRT),
                intrinsics)
            img = draw_bboxes(img, proj, (255, 0, 0))
    if draw_gt and gt_sRT is not None:
        img = _draw_group(img, gt_sRT, gt_size, gt_class_ids, intrinsics,
                          (0, 255, 0), draw_bbox, draw_axis)
    if draw_pred and pred_sRT is not None:
        img = _draw_group(img, pred_sRT, pred_size, pred_class_ids, intrinsics,
                          (0, 0, 255), draw_bbox, draw_axis,
                          flags=error_flags)
    os.makedirs(out_dir, exist_ok=True)
    if not cv2.imwrite(out_path, img):
        # imwrite returns False instead of raising (bad path/encoder)
        raise IOError(f"cv2.imwrite failed for {out_path}")
    return out_path
