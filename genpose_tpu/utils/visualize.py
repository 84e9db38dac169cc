"""Point-cloud pose visualization (grid images, diffusion videos).

TPU-framework counterpart of reference ``utils/visualize.py`` — same
artifacts (front/top splat views per sample, 16-row grids for the metrics
logger, per-step diffusion videos at eval time), but built on vectorized
numpy splatting instead of the reference's per-point Python loops, and on
the JAX pose ops (``genpose_tpu.ops.pose.transform_batch_pts``).

Everything here is host-side and optional: matplotlib is imported lazily;
cv2 is attempted at import (it is only needed for color-image resize and
video encoding — the splat/grid paths are pure numpy) and a clear
ImportError is raised at the point of use when it is absent.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from genpose_tpu.ops.pose import transform_batch_pts

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _require_cv2():
    if cv2 is None:  # pragma: no cover
        raise ImportError(
            "cv2 is required for image-resize/video visualization paths")
    return cv2


# Default render cameras (reference ``visualize.py:167-187``): a 640-res
# pinhole intrinsic rendered at 360², viewed from 0.5 m in front / above.
_INTRINSICS = {"fx": 502.30, "fy": 502.30, "cx": 319.5, "cy": 319.5,
               "xres": 640, "yres": 640}
_TOP_VIEW = {"look_at": np.zeros(3), "location": np.array([0.0, 0.5, 0.0]),
             "up": np.array([0.0, 0.0, -1.0])}
_FRONT_VIEW = {"look_at": np.zeros(3), "location": np.array([0.0, 0.0, -0.5]),
               "up": np.array([0.0, -1.0, 0.0])}


def get_camera_pose(location, look_at, up):
    """Look-at camera -> camera-to-world (R, T) (ref ``visualize.py:60-94``)."""
    location = np.asarray(location, np.float64)
    z = np.asarray(look_at, np.float64) - location
    z = z / np.linalg.norm(z)
    up = np.asarray(up, np.float64) / np.linalg.norm(up)
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    y = y / np.linalg.norm(y)
    R = np.stack([x, y, z], axis=1)
    return R, location


def project_pts_to_image(
    pts: np.ndarray,
    image_size=(360, 360),
    camera_intrinsics: Dict = _INTRINSICS,
    camera_extrinsics: Dict = _FRONT_VIEW,
) -> np.ndarray:
    """Splat an (N,3|6) cloud to an RGB uint8 image, vectorized
    (ref ``visualize.py:95-164`` semantics: white background, last write
    wins per pixel, uv clamped to the frame)."""
    xres, yres = image_size
    sx = xres / camera_intrinsics["xres"]
    sy = yres / camera_intrinsics["yres"]
    fx, fy = camera_intrinsics["fx"] * sx, camera_intrinsics["fy"] * sy
    cx, cy = camera_intrinsics["cx"] * sx, camera_intrinsics["cy"] * sy

    R, T = get_camera_pose(camera_extrinsics["location"],
                           camera_extrinsics["look_at"],
                           camera_extrinsics["up"])
    xyz = np.asarray(pts[:, :3], np.float64)
    cam = (xyz - T) @ R  # world -> camera (R is orthonormal)
    z = cam[:, 2]
    z = np.where(np.abs(z) < 1e-9, 1e-9, z)
    u = np.clip(np.rint(fx * cam[:, 0] / z + cx).astype(int), 0, xres - 1)
    v = np.clip(np.rint(fy * cam[:, 1] / z + cy).astype(int), 0, yres - 1)

    image = np.full((yres, xres, 3), 255, dtype=np.uint8)
    if pts.shape[1] >= 6:
        image[v, u] = np.clip(pts[:, 3:6], 0, 255).astype(np.uint8)
    else:
        image[v, u] = np.array([0, 0, 255], np.uint8)
    return image


def pts_views(pts: np.ndarray):
    """(front, top) splat views of one cloud (ref ``visualize.py:167-197``)."""
    front = project_pts_to_image(pts, camera_extrinsics=_FRONT_VIEW)
    top = project_pts_to_image(pts, camera_extrinsics=_TOP_VIEW)
    return front, top


def resize_img_keep_ratio(img: np.ndarray, target_size) -> np.ndarray:
    """Aspect-preserving resize with black padding (ref ``visualize.py:18-29``)."""
    _require_cv2()
    old = img.shape[:2]
    ratio = min(target_size[i] / old[i] for i in range(2))
    new = tuple(int(s * ratio) for s in old)
    img = cv2.resize(img, (new[1], new[0]))
    pad_h, pad_w = target_size[0] - new[0], target_size[1] - new[1]
    return cv2.copyMakeBorder(
        img, pad_h // 2, pad_h - pad_h // 2, pad_w // 2, pad_w - pad_w // 2,
        cv2.BORDER_CONSTANT, None, (0, 0, 0))


def create_grid_image(
    batch_pts,
    batch_pred_pose,
    batch_gt_pose=None,
    batch_color=None,
    pose_mode: str = "rot_matrix",
    inverse_pose: bool = False,
):
    """Row-per-sample comparison strip (ref ``visualize.py:200-261``).

    Columns: [color?] pred-front pred-top [gt-front gt-top]; up to 16 rows.
    Returns ``(grid, images)`` as uint8 numpy, grid shaped (H*rows, W, 3).
    """
    batch_pts = np.asarray(batch_pts)
    n = min(batch_pts.shape[0], 16)
    batch_pts = batch_pts[:n]
    batch_pred_pose = np.asarray(batch_pred_pose)[:n]

    pred_pts = np.asarray(transform_batch_pts(
        batch_pts, batch_pred_pose, pose_mode, inverse_pose))
    gt_pts = None
    if batch_gt_pose is not None:
        gt_pts = np.asarray(transform_batch_pts(
            batch_pts, np.asarray(batch_gt_pose)[:n], pose_mode, inverse_pose))

    rows: List[np.ndarray] = []
    for i in range(n):
        cols = []
        pf, pt = pts_views(pred_pts[i])
        if batch_color is not None:
            color = np.asarray(batch_color[i])
            if color.ndim == 3 and color.shape[0] in (3, 4):
                color = color.transpose(1, 2, 0)[..., :3]
            cols.append(resize_img_keep_ratio(
                color.astype(np.uint8), [pf.shape[0], pf.shape[1]]))
        cols += [pf, pt]
        if gt_pts is not None:
            gf, gt_img = pts_views(gt_pts[i])
            cols += [gf, gt_img]
        rows.append(np.concatenate(cols, axis=1))
    images = np.stack(rows)          # (n, H, W*, 3)
    grid = np.concatenate(rows, axis=0)
    return grid, images


def save_video(
    save_path: str,
    batch_pts,
    batch_pred_pose_list: Sequence,
    batch_gt_pose=None,
    batch_color=None,
    fps: int = 20,
    pose_mode: str = "rot_matrix",
    inverse_pose: bool = False,
):
    """One mp4 per sample animating the pose trajectory
    (ref ``visualize.py:264-293``)."""
    _require_cv2()
    os.makedirs(save_path, exist_ok=True)
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writers = None
    for batch_pose in batch_pred_pose_list:
        _, images = create_grid_image(
            batch_pts, batch_pose, batch_gt_pose, batch_color,
            pose_mode, inverse_pose)
        if writers is None:
            h, w = images.shape[1:3]
            writers = [
                cv2.VideoWriter(os.path.join(save_path, f"example_{i}.mp4"),
                                fourcc, max(int(fps), 1), (w, h), True)
                for i in range(images.shape[0])
            ]
        for i in range(images.shape[0]):
            writers[i].write(images[i][..., ::-1])  # RGB -> BGR
    if writers:
        for w in writers:
            w.release()


def test_time_visualize(save_path, data, res, in_process_sample,
                        pose_mode: str, o2c_pose: bool):
    """Result grid + per-step diffusion videos (ref ``visualize.py:296-330``).

    in_process_sample: (bs, steps, pose_dim) sampler trajectory.
    """
    os.makedirs(save_path, exist_ok=True)
    pts = np.asarray(data["pts"])
    if "pts_color" in data:
        pts = np.concatenate([pts, np.asarray(data["pts_color"])], axis=2)
    n = min(pts.shape[0], 16)
    gt = data.get("gt_pose")
    gt = None if gt is None else np.asarray(gt)[:n]

    grid, _ = create_grid_image(pts[:n], np.asarray(res)[:n], gt, None,
                                pose_mode, o2c_pose)
    _require_cv2().imwrite(os.path.join(save_path, "res_grid.png"), grid[..., ::-1])

    traj = np.asarray(in_process_sample).transpose(1, 0, 2)  # (steps, bs, D)
    traj = traj[-traj.shape[0] // 2:]           # last 50% of the trajectory
    if traj.shape[0] > 100:
        traj = traj[:: traj.shape[0] // 100]
    save_video(save_path, pts[:n], traj[:, :n], gt, None,
               fps=max(traj.shape[0] // 5, 1), pose_mode=pose_mode,
               inverse_pose=o2c_pose)


def standardize_bbox(pcl: np.ndarray, points_per_object: int,
                     rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Subsample + normalize a cloud into [-0.5, 0.5]^3
    (ref ``visualize.py:391-404``)."""
    rng = rng or np.random.default_rng(0)
    if pcl.shape[0] > points_per_object:
        pcl = pcl[rng.choice(pcl.shape[0], points_per_object, replace=False)]
    mins, maxs = pcl.min(axis=0), pcl.max(axis=0)
    center = (mins + maxs) / 2.0
    scale = (maxs - mins).max()
    return ((pcl - center) / scale).astype(np.float32)


def generate_xml_for_mitsuba(
    pts: np.ndarray,
    save_path: Optional[str] = None,
    image_size=(640, 360),
    fov: float = 20.0,
    camera=("3,3,3", "0,0,0", "0,0,1"),
    light=("-4,4,20", "0,0,0", "0,0,1"),
    sphere_radius: float = 0.025,
    points_per_object: int = 2048,
) -> str:
    """Mitsuba scene XML rendering a point cloud as shaded spheres
    (ref ``visualize.py:383-520``): path-traced perspective camera, one
    sphere per point colored by normalized position, ground plane + area
    light.  Returns the XML string; writes it when ``save_path`` given."""
    pcl = standardize_bbox(np.asarray(pts)[:, :3], points_per_object)
    head = f"""<scene version="0.6.0">
    <integrator type="path"><integer name="maxDepth" value="-1"/></integrator>
    <sensor type="perspective">
        <float name="farClip" value="100"/>
        <float name="nearClip" value="0.1"/>
        <transform name="toWorld">
            <lookat origin="{camera[0]}" target="{camera[1]}" up="{camera[2]}"/>
        </transform>
        <float name="fov" value="{fov}"/>
        <sampler type="ldsampler"><integer name="sampleCount" value="256"/></sampler>
        <film type="hdrfilm">
            <integer name="width" value="{image_size[0]}"/>
            <integer name="height" value="{image_size[1]}"/>
            <rfilter type="gaussian"/>
            <boolean name="banner" value="false"/>
        </film>
    </sensor>
    <bsdf type="roughplastic" id="surfaceMaterial">
        <string name="distribution" value="ggx"/>
        <float name="alpha" value="0.05"/>
        <float name="intIOR" value="1.46"/>
        <rgb name="diffuseReflectance" value="1,1,1"/>
    </bsdf>
"""
    balls = []
    for x, y, z in pcl:
        c = np.clip([x + 0.5, y + 0.5, z + 0.5 - 0.0125], 0.001, 1.0)
        c = c / np.linalg.norm(c)
        balls.append(
            f'    <shape type="sphere"><float name="radius" value="{sphere_radius}"/>'
            f'<transform name="toWorld"><translate x="{x}" y="{y}" z="{z}"/></transform>'
            f'<bsdf type="diffuse"><rgb name="reflectance" value="{c[0]},{c[1]},{c[2]}"/></bsdf></shape>\n')
    tail = f"""    <shape type="rectangle">
        <ref name="bsdf" id="surfaceMaterial"/>
        <transform name="toWorld"><scale x="100" y="100" z="1"/><translate x="0" y="0" z="-0.2"/></transform>
    </shape>
    <shape type="rectangle">
        <transform name="toWorld">
            <scale x="10" y="10" z="1"/>
            <lookat origin="{light[0]}" target="{light[1]}" up="{light[2]}"/>
        </transform>
        <emitter type="area"><rgb name="radiance" value="6,6,6"/></emitter>
    </shape>
</scene>
"""
    xml = head + "".join(balls) + tail
    if save_path:
        with open(save_path, "w") as f:
            f.write(xml)
    return xml


def so3_visualization(pred_rot, energy=None, gt_rot=None,
                      save_path="./so3_distribution.png"):
    """Energy-weighted SO(3) scatter (ref ``visualize.py:355-380``)."""
    from genpose_tpu.utils.so3_visualize import visualize_so3

    pred_rot = np.asarray(pred_rot)
    if energy is None:
        confidence = np.ones(pred_rot.shape[0]) / 200
    else:
        e = np.asarray(energy)[:, 0]
        confidence = np.exp(e - e.max())
        confidence = confidence / confidence.sum() / 10
    visualize_so3(save_path=save_path, pred_rotations=pred_rot,
                  gt_rotation=gt_rot, probabilities=confidence)
