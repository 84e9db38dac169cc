"""Golden-value tests for the NOCS mAP protocol on synthetic detections."""

import numpy as np

from genpose_tpu.eval import nocs_eval
from genpose_tpu.eval.nocs_eval import (
    SYNSET_NAMES_BG,
    compute_2d_IoU,
    compute_3d_IoU,
    compute_ap_and_acc,
    compute_mAP,
    sort_sRT,
    sort_sRT_by_energy,
)


def _rot(axis, deg):
    t = np.radians(deg)
    c, s = np.cos(t), np.sin(t)
    if axis == "y":
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    if axis == "z":
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def _srt(R=np.eye(3), t=(0, 0, 1.0), s=1.0):
    m = np.eye(4)
    m[:3, :3] = s * R
    m[:3, 3] = t
    return m


def test_2d_iou():
    assert compute_2d_IoU([0, 0, 9, 9], [0, 0, 9, 9]) == 1.0
    assert compute_2d_IoU([0, 0, 9, 9], [100, 100, 109, 109]) == 0.0
    iou = compute_2d_IoU([0, 0, 9, 9], [5, 0, 14, 9])
    assert abs(iou - 50.0 / 150.0) < 1e-6


def test_3d_iou_identity_and_disjoint():
    size = np.array([0.2, 0.3, 0.1])
    assert abs(compute_3d_IoU(_srt(), _srt(), size, size, "camera", "camera", 1)
               - 1.0) < 1e-6
    far = _srt(t=(5, 0, 1.0))
    # quirky per-corner arithmetic gives a tiny but nonzero value here
    assert compute_3d_IoU(_srt(), far, size, size, "camera", "camera", 1) < 1e-4


def test_3d_iou_symmetric_y_sweep():
    """A y-rotated bottle must still achieve IoU ~1 via the 20-step sweep."""
    size = np.array([0.2, 0.3, 0.2])
    rotated = _srt(R=_rot("y", 45))
    iou_sym = compute_3d_IoU(rotated, _srt(), size, size, "bottle", "bottle", 1)
    iou_asym = compute_3d_IoU(rotated, _srt(), size, size, "camera", "camera", 1)
    # 20-step sweep granularity is 18 deg, so a 45-deg offset lands at worst
    # 9 deg from a sweep sample under the quirky NOCS arithmetic
    assert iou_sym > 0.8
    assert iou_asym < iou_sym


def test_ap_perfect_and_worst():
    # all matched
    ap, acc = compute_ap_and_acc(np.array([0, 1, 2.0]), np.ones(3), np.zeros(3))
    assert ap == 1.0 and acc == 1.0
    ap, acc = compute_ap_and_acc(-np.ones(3), np.ones(3), -np.ones(3))
    assert ap == 0.0 and acc == 0.0


def test_sort_srt_decoupled():
    K = 3
    poses = np.tile(np.eye(4), (1, K, 1, 1))
    for k in range(K):
        poses[0, k, :3, :3] = _rot("z", 10 * k)
        poses[0, k, :3, 3] = [k, 0, 0]
    energy = np.array([[[1.0, 3.0], [3.0, 1.0], [2.0, 2.0]]])
    sorted_poses, sorted_energy = sort_sRT(poses.copy(), energy)
    # rot order by rot-energy desc: hyp 1, 2, 0
    np.testing.assert_allclose(sorted_poses[0, 0, :3, :3], _rot("z", 10))
    # trans column by trans-energy desc: hyp 0, 2, 1
    np.testing.assert_allclose(sorted_poses[0, 0, :3, 3], [0, 0, 0])
    np.testing.assert_array_equal(sorted_energy[0, :, 0], [3, 2, 1])


def test_sort_srt_by_energy_average_pooling():
    """Top-60% + quaternion averaging of noisy hypotheses lands near GT."""
    rng = np.random.default_rng(0)
    K = 10
    gt_R = _rot("z", 30)
    hyps = np.zeros((1, K, 4, 4))
    energy = np.zeros((1, K, 2))
    for k in range(K):
        noise_deg = 2.0 if k < 6 else 60.0  # 4 bad hypotheses
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        from scipy.spatial.transform import Rotation as Rot
        delta = Rot.from_rotvec(axis * np.radians(noise_deg * rng.random())).as_matrix()
        hyps[0, k] = _srt(R=delta @ gt_R, t=(0, 0, 1.0))
        energy[0, k] = 10.0 - k  # descending: good ones first
    sel, avg, sel_e = sort_sRT_by_energy(hyps, energy, None, "energy_ranker",
                                         ratio=0.6, error_mode="average")
    assert sel.shape == (1, 6, 4, 4)
    assert avg.shape == (1, 4, 4)
    rel = avg[0, :3, :3] @ gt_R.T
    ang = np.degrees(np.arccos(np.clip((np.trace(rel) - 1) / 2, -1, 1)))
    assert ang < 3.0


def _scene(rng, n_gt=3, K=5, rot_err_deg=1.0, trans_err=0.005, scene_idx=0):
    """One synthetic scene: perfect detections, slightly noisy pose hypotheses.

    Classes cycle deterministically so every class appears across scenes
    (classes with zero GT instances score AP 0 and drag the mean, matching
    the reference's behavior)."""
    from scipy.spatial.transform import Rotation as Rot

    gt_ids, gt_rts, gt_scales, gt_bboxes = [], [], [], []
    pred_ids, pred_rts, pred_energy, pred_scores, pred_bboxes = [], [], [], [], []
    for i in range(n_gt):
        cls = (scene_idx * n_gt + i) % 6 + 1
        R = Rot.random(random_state=int(rng.integers(1 << 30))).as_matrix()
        t = np.array([rng.uniform(-0.3, 0.3), rng.uniform(-0.3, 0.3),
                      rng.uniform(0.8, 1.2)])
        gt_ids.append(cls)
        gt_rts.append(_srt(R, t))
        gt_scales.append(np.array([0.2, 0.2, 0.2]))
        bbox = np.array([10 + 50 * i, 10 + 50 * i, 40 + 50 * i, 40 + 50 * i])
        gt_bboxes.append(bbox)

        hyps = []
        for k in range(K):
            axis = rng.normal(size=3)
            axis /= np.linalg.norm(axis)
            delta = Rot.from_rotvec(
                axis * np.radians(rot_err_deg * rng.random())).as_matrix()
            dt = rng.normal(scale=trans_err, size=3)
            hyps.append(_srt(delta @ R, t + dt))
        pred_ids.append(cls)
        pred_rts.append(np.stack(hyps))
        pred_energy.append(np.tile(np.arange(K, 0, -1)[:, None], (1, 2)))
        pred_scores.append(1.0)
        pred_bboxes.append(bbox + rng.integers(-2, 3, size=4))

    return {
        "gt_class_ids": np.array(gt_ids),
        "gt_RTs": np.stack(gt_rts),
        "gt_scales": np.stack(gt_scales),
        "gt_handle_visibility": np.ones(n_gt, dtype=np.int32),
        "gt_bboxes": np.stack(gt_bboxes),
        "pred_class_ids": np.array(pred_ids),
        "multi_hypothesis_pred_RTs": np.stack(pred_rts),
        "energy": np.stack(pred_energy).astype(np.float64),
        "pred_scales": np.stack(gt_scales),
        "pred_scores": np.array(pred_scores),
        "pred_bboxes": np.stack(pred_bboxes),
    }


def test_compute_map_perfect_predictions(tmp_path):
    rng = np.random.default_rng(1)
    results = [_scene(rng, scene_idx=i) for i in range(4)]
    degree_thres = [5, 10]
    shift_thres = [2, 5]
    iou_aps, pose_aps, iou_acc, pose_acc = compute_mAP(
        results, str(tmp_path), degree_thres, shift_thres,
        iou_3d_thresholds=[0.1], iou_pose_thres=0.1, use_matches_for_pose=True,
        pooling_mode="average", ratio=0.6, ranker="energy_ranker",
    )
    # ~1 deg rot error and 0.5cm trans error: all thresholds should be ~1.0
    assert pose_aps[-1, 0, 0] > 0.95  # 5 deg 2cm
    assert pose_aps[-1, 1, 1] > 0.95  # 10 deg 5cm


def test_compute_map_bad_rotations(tmp_path):
    rng = np.random.default_rng(2)
    results = [_scene(rng, rot_err_deg=90.0, trans_err=0.1, scene_idx=i)
               for i in range(4)]
    _, pose_aps, _, _ = compute_mAP(
        results, str(tmp_path), [5, 10], [2, 5], iou_3d_thresholds=[0.1],
        iou_pose_thres=0.1, use_matches_for_pose=True,
        pooling_mode="average", ratio=0.6,
    )
    assert pose_aps[-1, 0, 0] < 0.5  # 5 deg 2cm mostly missed
    # the padded 360 deg / 100 cm thresholds still match everything
    assert pose_aps[-1, -1, -1] > 0.95


def test_compute_map_gt_ranker_not_worse(tmp_path):
    """gt_ranker upper-bounds energy_ranker when energies are random."""
    rng = np.random.default_rng(3)
    results = []
    for _ in range(3):
        sc = _scene(rng, K=8, rot_err_deg=30.0, trans_err=0.02, scene_idx=0)
        sc["energy"] = rng.random(sc["energy"].shape)
        results.append(sc)
    _, aps_energy, _, _ = compute_mAP(
        results, None, [5], [2], iou_3d_thresholds=[0.1], iou_pose_thres=0.1,
        use_matches_for_pose=True, pooling_mode="nearest", ratio=0.25)
    _, aps_gt, _, _ = compute_mAP(
        results, None, [5], [2], iou_3d_thresholds=[0.1], iou_pose_thres=0.1,
        use_matches_for_pose=True, pooling_mode="nearest", ratio=0.25,
        ranker="gt_ranker")
    assert aps_gt[-1, 0, 0] >= aps_energy[-1, 0, 0] - 1e-9


def test_compute_map_gt_ranker_false_positive_class(tmp_path):
    """gt_ranker must survive a scene containing predictions of a class with
    ZERO GT instances (real MRCNN results routinely have such false
    positives; the reference crashes on a zero-size np.min,
    ``sgpa_utils.py:938-939`` — documented deviation: the incoming
    hypothesis order is kept for that class)."""
    rng = np.random.default_rng(4)
    sc = _scene(rng, n_gt=2, scene_idx=0)
    # add a false-positive detection of a class absent from the GT set
    fp_cls = next(c for c in range(1, 7)
                  if c not in set(sc["gt_class_ids"].tolist()))
    K = sc["multi_hypothesis_pred_RTs"].shape[1]
    sc["pred_class_ids"] = np.append(sc["pred_class_ids"], fp_cls)
    sc["multi_hypothesis_pred_RTs"] = np.concatenate(
        [sc["multi_hypothesis_pred_RTs"],
         np.tile(np.eye(4), (1, K, 1, 1))], axis=0)
    sc["energy"] = np.concatenate(
        [sc["energy"], np.ones((1, K, 2))], axis=0)
    sc["pred_scales"] = np.concatenate(
        [sc["pred_scales"], np.full((1, 3), 0.2)], axis=0)
    sc["pred_scores"] = np.append(sc["pred_scores"], 0.9)
    sc["pred_bboxes"] = np.concatenate(
        [sc["pred_bboxes"], np.array([[300, 300, 330, 330]])], axis=0)

    _, pose_aps, _, _ = compute_mAP(
        [sc], str(tmp_path), [5], [2], iou_3d_thresholds=[0.1],
        iou_pose_thres=0.1, use_matches_for_pose=True,
        pooling_mode="nearest", ratio=0.5, ranker="gt_ranker")
    # the true-positive classes still score; the run does not crash
    assert np.all(np.isfinite(pose_aps))


def test_greedy_match_score_threshold_trims():
    """The reference's "remove low scores" trimming (``sgpa_utils.py:
    414-418``): an overlap below score_threshold must not match even when it
    clears the IoU threshold."""
    from genpose_tpu.eval.nocs_eval import _greedy_match

    overlaps = np.array([[0.3]], dtype=np.float32)
    gt_m, pred_m = _greedy_match(overlaps, [0.25], [1], [1])
    assert pred_m[0, 0] == 0  # matches without trimming (0.3 > 0.25)
    gt_m, pred_m = _greedy_match(overlaps, [0.25], [1], [1],
                                 score_threshold=0.5)
    assert pred_m[0, 0] == -1  # trimmed before the scan
