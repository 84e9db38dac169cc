"""Tests for detection drawing + Mitsuba export parity components."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from genpose_tpu.eval.draw import (
    align_rotation,
    calculate_2d_projections,
    draw_detections,
    get_3d_coord_axis,
)
from genpose_tpu.utils.visualize import generate_xml_for_mitsuba


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def test_align_rotation_cancels_y_spin():
    sRT = np.identity(4)
    sRT[:3, :3] = 2.0 * _rot_y(0.7)  # scale 2, spun around y
    aligned = align_rotation(sRT)
    # y-symmetric alignment removes the y-rotation, keeps the scale
    np.testing.assert_allclose(aligned[:3, :3], 2.0 * np.eye(3), atol=1e-6)


def test_projections_principal_point():
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    pts = np.array([[0.0], [0.0], [1.0]])
    uv = calculate_2d_projections(pts, K)
    np.testing.assert_array_equal(uv, [[320, 240]])


def test_draw_detections_writes_png(tmp_path):
    img = np.full((480, 640, 3), 255, np.uint8)
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    sRT = np.identity(4)[None].astype(np.float64)
    sRT[0, 2, 3] = 1.0  # 1m in front of the camera
    size = np.array([[0.2, 0.2, 0.2]])
    out = draw_detections(
        img, str(tmp_path), "real", 0, K,
        pred_sRT=sRT, pred_size=size, pred_class_ids=np.array([3]),
        gt_sRT=sRT, gt_size=size, gt_class_ids=np.array([3]),
        draw_nocs=False, draw_bbox=True)
    im = cv2.imread(out)
    assert im is not None and (im != 255).any()


def test_mitsuba_xml(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    path = tmp_path / "scene.xml"
    xml = generate_xml_for_mitsuba(pts, save_path=str(path))
    assert path.exists()
    assert xml.count('<shape type="sphere">') == 500
    assert '<scene version="0.6.0">' in xml
    import xml.etree.ElementTree as ET
    ET.fromstring(xml)  # well-formed


def test_setup_logger(tmp_path):
    from genpose_tpu.utils.logging import setup_logger
    log = setup_logger("t", str(tmp_path / "x.log"))
    log.info("hello")
    assert "hello" in open(tmp_path / "x.log").read()
