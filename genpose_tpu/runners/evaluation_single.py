"""Single-frame NOCS evaluation pipeline (re-design of
``runners/evaluation_single.py``).

4 stages, same artifacts (pkl caches are format-compatible with the
reference's released ``segmentation_results_*.pkl``):

1. :func:`detect_mrcnn_results` — mrcnn pkls -> per-instance 1024-pt clouds,
   cached into one big segmentation pkl (ref ``:105-260``);
2. :func:`inference_pose` — per-category batches, K=``eval_repeat_num``
   ScoreNet ODE samples -> 4x4 RTs, ``results_wo_energy.pkl`` (ref ``:356-425``);
3. :func:`inference_energy` — EnergyNet energies, decoupled hypothesis sort,
   ``results_with_energy.pkl`` (ref ``:428-489``);
4. :func:`evaluate` — NOCS mAP over 46 degree x 21 shift x 101 IoU
   thresholds with ranking/pooling, logs + curves (ref ``:492-544``).

TPU notes: inference pads every category batch to a fixed ``batch_size`` so
the jitted sampler compiles ONCE; the K hypotheses ride the batch axis.
"""

from __future__ import annotations

import json
import os
import pickle
import sys
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from genpose_tpu.config import Config, enable_compile_cache, get_config
from genpose_tpu.data.dataset_utils import (
    aug_bbox_eval,
    backproject_and_sample,
    crop_resize_by_warp_affine,
    get_2d_coord_np,
    get_bbox,
    load_depth,
)
from genpose_tpu.eval.nocs_eval import compute_mAP, plot_mAP
from genpose_tpu.ops.pose import get_rot_matrix
from genpose_tpu.parallel.mesh import make_mesh, shard_batch
from genpose_tpu.training.agent import PoseAgent
from genpose_tpu.training.checkpoints import load_checkpoint
from genpose_tpu.training.ranking import sort_poses_by_energy

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

CAMERA_K = np.array([[577.5, 0, 319.5], [0, 577.5, 239.5], [0, 0, 1]], np.float32)
REAL_K = np.array([[591.0125, 0, 322.525], [0, 590.16775, 244.11084], [0, 0, 1]],
                  np.float32)


def intrinsics_for_source(test_source: str) -> np.ndarray:
    return CAMERA_K if test_source == "val" else REAL_K


def file_list_for_source(test_source: str) -> str:
    assert test_source in ("val", "real_test")
    return "CAMERA/val_list.txt" if test_source == "val" else "Real/test_list.txt"


def _instance_points(raw_depth, mask, bbox, cam_K, img_size, num_points, rng):
    """One instance: square crop -> masked depth -> 1024-pt cloud, or None.

    (ref ``evaluation_single.py:168-216``; eval-time crop uses the plain
    deterministic bbox, no DZI.)
    """
    im_H, im_W = raw_depth.shape
    rmin, rmax, cmin, cmax = get_bbox(bbox, im_H, im_W)
    bbox_center, scale = aug_bbox_eval((cmin, rmin, cmax, rmax), im_H, im_W)

    coord_2d = get_2d_coord_np(im_W, im_H).transpose(1, 2, 0)
    roi_coord_2d = crop_resize_by_warp_affine(
        coord_2d, bbox_center, scale, img_size, interpolation=cv2.INTER_NEAREST
    ).transpose(2, 0, 1)
    roi_mask = crop_resize_by_warp_affine(
        mask.astype(np.float32), bbox_center, scale, img_size,
        interpolation=cv2.INTER_NEAREST)[None]
    roi_depth = crop_resize_by_warp_affine(
        raw_depth.astype(np.float32), bbox_center, scale, img_size,
        interpolation=cv2.INTER_NEAREST)[None]

    if (roi_depth > 0).sum() <= 1.0:
        return None
    if (roi_mask.astype(bool) * (roi_depth > 0)).sum() <= 1.0:
        return None
    n_valid, pcl = backproject_and_sample(
        roi_depth, cam_K, roi_coord_2d, roi_mask, num_points, rng,
        scale=1.0 / 1000.0)
    if n_valid == 0:
        return None
    return pcl


def detect_mrcnn_genpose(cfg: Config, save_path: str):
    """Stage 1: build the per-instance point-cloud cache
    (ref ``evaluation_single.py:105-260``)."""
    file_path = file_list_for_source(cfg.test_source)
    cam_K = intrinsics_for_source(cfg.test_source)
    rng = np.random.default_rng(cfg.seed)

    with open(os.path.join(cfg.data_path, file_path)) as f:
        img_list = [os.path.join(file_path.split("/")[0], line.rstrip("\n"))
                    for line in f]

    test_data: Dict[str, dict] = {}
    img_count = inst_count = 0
    for path in img_list:
        img_path = os.path.join(cfg.data_path, path)
        raw_depth = load_depth(img_path)

        parts = img_path.split("/")
        mrcnn_path = os.path.join(
            cfg.result_dir, "mrcnn_results", cfg.test_source,
            "results_{}_{}_{}.pkl".format(
                cfg.test_source.split("_")[-1], parts[-2], parts[-1]),
        )
        with open(mrcnn_path, "rb") as f:
            mrcnn_result = pickle.load(f)
        num_insts = len(mrcnn_result["class_ids"])
        f_sRT = np.tile(np.identity(4), (num_insts, 1, 1))
        f_size = np.ones((num_insts, 3))

        f_points, f_catId, valid_inst = [], [], []
        for i in range(num_insts):
            mask = np.logical_and(mrcnn_result["masks"][:, :, i], raw_depth > 0)
            pts = _instance_points(
                raw_depth, mask, mrcnn_result["rois"][i], cam_K, cfg.img_size,
                cfg.num_points, rng)
            if pts is None:
                continue
            valid_inst.append(i)
            f_points.append(pts)
            f_catId.append(mrcnn_result["class_ids"][i] - 1)

        if valid_inst:
            img_count += 1
            inst_count += len(valid_inst)

        with open(img_path + "_label.pkl", "rb") as f:
            gts = pickle.load(f)
        result = {
            "gt_class_ids": gts["class_ids"],
            "gt_bboxes": gts["bboxes"],
            "gt_RTs": gts["poses"],
            "gt_scales": gts["size"],
            "gt_handle_visibility": gts["handle_visibility"],
            "pred_class_ids": mrcnn_result["class_ids"],
            "pred_bboxes": mrcnn_result["rois"],
            "pred_scores": mrcnn_result["scores"],
            "pred_RTs": f_sRT,
            "pred_scales": f_size,
        }
        test_data[img_path] = {
            "result": result,
            "valid_pts": f_points,
            "valid_rgb": None,
            "cat_id": f_catId,
            "valid_inst": valid_inst,
        }

    os.makedirs(os.path.dirname(save_path), exist_ok=True)
    with open(save_path, "wb") as f:
        pickle.dump(test_data, f)
    stats_path = save_path.replace("_results_", "_logs_").replace(".pkl", ".txt")
    with open(stats_path, "w") as f:
        f.write(f"Total images: {len(img_list)}\n")
        avg = inst_count / max(img_count, 1)
        f.write(f"Valid images: {img_count},  Total instances: {inst_count},"
                f"  Average: {avg:.2f}/image\n")
    return save_path


def detect_mrcnn_results(cfg: Config, segmentation_results_path: str):
    if os.path.exists(segmentation_results_path):
        print(f"Segmentation results exist, loading {segmentation_results_path}")
        return segmentation_results_path
    return detect_mrcnn_genpose(cfg, segmentation_results_path)


def unpack_data(cfg: Config, path: str):
    """Group instances by category (ref ``evaluation_single.py:263-306``)."""
    with open(path, "rb") as f:
        detect_result = pickle.load(f)

    categorized = {
        name: {"img_path": [], "pts": [], "cat_id": [], "inst": []}
        for name in cfg.synset_names
    }
    K = cfg.eval_repeat_num
    for key, entry in detect_result.items():
        n = entry["result"]["pred_RTs"].shape[0]
        entry["result"]["multi_hypothesis_pred_RTs"] = np.tile(
            np.identity(4), (n, K, 1, 1))
        entry["result"]["energy"] = np.zeros((n, K, 2))
        for i, inst in enumerate(entry["valid_inst"]):
            cat_name = cfg.synset_names[entry["cat_id"][i]]
            categorized[cat_name]["img_path"].append(key)
            categorized[cat_name]["pts"].append(entry["valid_pts"][i])
            categorized[cat_name]["cat_id"].append(entry["cat_id"][i])
            categorized[cat_name]["inst"].append(inst)
    return detect_result, categorized


def _zero_center_batch(pts: np.ndarray):
    pts = jnp.asarray(pts, jnp.float32)
    center = jnp.mean(pts[:, :, :3], axis=1)
    zm = pts.at[:, :, :3].add(-center[:, None, :])
    return {"zero_mean_pts": zm, "pts_center": center, "pts": pts}


def _pose_to_rts(pred_pose: np.ndarray, pose_mode: str) -> np.ndarray:
    """[N, K, pose_dim] -> [N, K, 4, 4] (ref ``evaluation_single.py:324-332``)."""
    N, K, _ = pred_pose.shape
    flat = jnp.asarray(pred_pose.reshape(N * K, -1))
    R = np.asarray(get_rot_matrix(flat[:, :-3], pose_mode))
    rts = np.tile(np.identity(4), (N * K, 1, 1))
    rts[:, :3, :3] = R
    rts[:, :3, 3] = np.asarray(flat[:, -3:])
    return rts.reshape(N, K, 4, 4)


def _batched(num: int, batch_size: int):
    index = [i * batch_size for i in range(0, num // batch_size + 1)]
    return index if index and index[-1] == num else index + [num]


def inference_pose(cfg: Config, score_agent: PoseAgent, data_path: str,
                   inference_res_dir: str, key: Optional[jax.Array] = None,
                   mesh=None):
    """Stage 2: K-hypothesis score sampling per category batch
    (ref ``evaluation_single.py:356-425``).

    With a mesh, each padded batch is sharded over the ``dp`` axis and the
    jitted sampler runs SPMD across chips — the (instances x K) axis is the
    scalable dimension of this workload (SURVEY §2.3).
    """
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    detect_result, categorized = unpack_data(cfg, data_path)

    for cat, data in categorized.items():
        num = len(data["img_path"])
        if num == 0:
            data["pred_pose"] = []
            continue
        print(f"Inferencing {cat}: {num} instances")
        data["pred_pose"] = []
        bounds = _batched(num, cfg.batch_size)
        for i in range(len(bounds) - 1):
            pts = np.asarray(data["pts"][bounds[i]:bounds[i + 1]])
            n_real = pts.shape[0]
            # pad to the full batch so the jitted sampler compiles once
            if n_real < cfg.batch_size:
                pad = np.repeat(pts[-1:], cfg.batch_size - n_real, axis=0)
                pts = np.concatenate([pts, pad], axis=0)
            batch = _zero_center_batch(pts)
            if mesh is not None:
                batch = shard_batch(mesh, batch)
            key, k_s = jax.random.split(key)
            pred = score_agent.sample(
                batch, k_s, repeat_num=cfg.eval_repeat_num,
                # sampler resolves from cfg.sampler_mode: "ode" (fixed-step
                # Heun at cfg.sampling_steps) or "ode_adaptive" (RK45 at
                # atol/rtol 1e-5 — what the reference's released eval/
                # tracking actually integrate with, since its scripts set no
                # --sampling_steps and solve_ivp is always adaptive)
                sampler=None,
                num_steps=cfg.sampling_steps, T0=cfg.T0)
            pred = np.asarray(pred)[:n_real]  # [n, K, pose_dim]
            rts = _pose_to_rts(pred, cfg.pose_mode)
            data["pred_pose"] += list(pred)
            for bi, path in enumerate(data["img_path"][bounds[i]:bounds[i + 1]]):
                inst = data["inst"][bounds[i] + bi]
                detect_result[path]["result"]["multi_hypothesis_pred_RTs"][inst] = \
                    rts[bi]

    os.makedirs(inference_res_dir, exist_ok=True)
    with open(os.path.join(inference_res_dir, "results_wo_energy.pkl"), "wb") as f:
        pickle.dump(detect_result, f)
    with open(os.path.join(inference_res_dir, "cls_data.pkl"), "wb") as f:
        pickle.dump(categorized, f)


def inference_energy(cfg: Config, energy_agent: PoseAgent,
                     inference_res_dir: str, mesh=None):
    """Stage 3: energy scoring + decoupled hypothesis sort
    (ref ``evaluation_single.py:428-489``)."""
    with open(os.path.join(inference_res_dir, "results_wo_energy.pkl"), "rb") as f:
        detect_result = pickle.load(f)
    with open(os.path.join(inference_res_dir, "cls_data.pkl"), "rb") as f:
        categorized = pickle.load(f)

    for cat, data in categorized.items():
        num = len(data["img_path"])
        if num == 0:
            continue
        bounds = _batched(num, cfg.batch_size)
        for i in range(len(bounds) - 1):
            pts = np.asarray(data["pts"][bounds[i]:bounds[i + 1]])
            pred_pose = np.asarray(data["pred_pose"][bounds[i]:bounds[i + 1]])
            n_real = pts.shape[0]
            if n_real < cfg.batch_size:
                pad_n = cfg.batch_size - n_real
                pts = np.concatenate([pts, np.repeat(pts[-1:], pad_n, 0)], 0)
                pred_pose = np.concatenate(
                    [pred_pose, np.repeat(pred_pose[-1:], pad_n, 0)], 0)
            batch = _zero_center_batch(pts)
            if mesh is not None:
                batch = shard_batch(mesh, batch)
            energy = energy_agent.get_energy(
                batch, jnp.asarray(pred_pose), T=1e-5)
            sorted_pose, sorted_energy = sort_poses_by_energy(
                jnp.asarray(pred_pose), energy)
            sorted_pose = np.asarray(sorted_pose)[:n_real]
            sorted_energy = np.asarray(sorted_energy)[:n_real]
            rts = _pose_to_rts(sorted_pose, cfg.pose_mode)
            for bi, path in enumerate(data["img_path"][bounds[i]:bounds[i + 1]]):
                inst = data["inst"][bounds[i] + bi]
                res = detect_result[path]["result"]
                res["multi_hypothesis_pred_RTs"][inst] = rts[bi]
                res["energy"][inst] = sorted_energy[bi]

    with open(os.path.join(inference_res_dir, "results_with_energy.pkl"), "wb") as f:
        pickle.dump(detect_result, f)


def record_results_and_draw_curves(cfg, save_path, iou_aps, pose_aps, iou_acc,
                                   pose_acc, iou_thres_list, degree_thres_list,
                                   shift_thres_list):
    """Headline-number logs + curves (ref ``evaluation_single.py:62-102``)."""
    plot_mAP(iou_aps, pose_aps, save_path["inference_res_dir"], iou_thres_list,
             degree_thres_list, shift_thres_list,
             f"{save_path['pooling_mode']}_ratio_{save_path['ratio']}_mAP.png")
    d05 = degree_thres_list.index(5)
    d10 = degree_thres_list.index(10)
    s02 = shift_thres_list.index(2)
    s05 = shift_thres_list.index(5)
    headline = {}
    for i in range(1, 8):
        cls_name = "mean" if i == 7 else cfg.synset_names[i - 1]
        messages = [
            f"cls_name: {cls_name}",
            f"{save_path['pooling_mode']}_ratio_{save_path['ratio']}",
            "mAP:",
            "5 degree, 2cm: {:.1f}".format(pose_aps[i, d05, s02] * 100),
            "5 degree, 5cm: {:.1f}".format(pose_aps[i, d05, s05] * 100),
            "10 degree, 2cm: {:.1f}".format(pose_aps[i, d10, s02] * 100),
            "10 degree, 5cm: {:.1f}".format(pose_aps[i, d10, s05] * 100),
            "Acc:",
            "5 degree, 2cm: {:.1f}".format(pose_acc[i, d05, s02] * 100),
            "5 degree, 5cm: {:.1f}".format(pose_acc[i, d05, s05] * 100),
            "10 degree, 2cm: {:.1f}".format(pose_acc[i, d10, s02] * 100),
            "10 degree, 5cm: {:.1f}".format(pose_acc[i, d10, s05] * 100),
        ]
        log = "eval_logs.txt" if i == 7 else "eval_logs_single_cls.txt"
        with open(os.path.join(save_path["inference_res_dir"], log), "a") as fw:
            for msg in messages:
                print(msg)
                fw.write(msg + "\n")
        if i == 7:
            headline = {
                "5d2cm": pose_aps[i, d05, s02] * 100,
                "5d5cm": pose_aps[i, d05, s05] * 100,
                "10d2cm": pose_aps[i, d10, s02] * 100,
                "10d5cm": pose_aps[i, d10, s05] * 100,
            }
    return headline


def evaluate(cfg: Config, inference_res_dir: str,
             file_name: str = "results_with_energy.pkl"):
    """Stage 4: NOCS mAP (ref ``evaluation_single.py:492-544``)."""
    degree_thres_list = list(range(0, 46, 1))
    shift_thres_list = [i / 2 for i in range(21)]
    iou_thres_list = [i / 100 for i in range(101)]

    with open(os.path.join(inference_res_dir, file_name), "rb") as f:
        predictions = pickle.load(f)

    pred_results = []
    for image_path, entry in predictions.items():
        result = entry["result"]
        if "gt_handle_visibility" not in result:
            result["gt_handle_visibility"] = np.ones_like(result["gt_class_ids"])
        pred_results.append(result)

    save_path = {
        "inference_res_dir": os.path.join(
            inference_res_dir, "results", cfg.pooling_mode, cfg.ranker),
        "ratio": 0,
        "pooling_mode": cfg.pooling_mode,
    }
    os.makedirs(save_path["inference_res_dir"], exist_ok=True)

    headline = None
    for ratio in (float(r) for r in cfg.eval_ratios):
        print(f"pooling_mode: {cfg.pooling_mode}, ranker: {cfg.ranker}, "
              f"ratio: {ratio}")
        iou_aps, pose_aps, iou_acc, pose_acc = compute_mAP(
            pred_results, save_path["inference_res_dir"], degree_thres_list,
            shift_thres_list, iou_thres_list, iou_pose_thres=0.1,
            use_matches_for_pose=True, repeat_num=cfg.eval_repeat_num,
            pooling_mode=cfg.pooling_mode, ratio=ratio, ranker=cfg.ranker,
        )
        save_path["ratio"] = ratio
        headline = record_results_and_draw_curves(
            cfg, save_path, iou_aps, pose_aps, iou_acc, pose_acc,
            iou_thres_list, degree_thres_list, shift_thres_list)
    return headline


def main(argv=None):
    cfg = get_config(argv if argv is not None else sys.argv[1:])
    enable_compile_cache(cfg)
    inference_res_root = os.path.join(cfg.result_dir, "evaluation_results")
    inference_res_dir = os.path.join(
        inference_res_root, f"{cfg.test_source}_repeat_{cfg.eval_repeat_num}")
    seg_path = os.path.join(
        inference_res_root, f"segmentation_results_{cfg.test_source}.pkl")

    print("Detecting ...")
    detect_mrcnn_results(cfg, seg_path)

    n_dev = cfg.num_devices or len(jax.devices())
    mesh = make_mesh(n_dev) if n_dev > 1 and cfg.batch_size % n_dev == 0 \
        else None
    if mesh is not None:
        print(f"Sharding eval batches over {n_dev} devices")

    def _load(agent, model_dir):
        # restore preserves the template's mesh placement — the agents below
        # are built WITH the mesh, so the restored state stays replicated
        # (tests/test_checkpoint.py::test_restore_preserves_mesh_sharding)
        agent.state = load_checkpoint(
            os.path.join("results", "ckpts", model_dir),
            agent.state, load_model_only=True)

    print("Predict pose ...")
    score_agent = PoseAgent(cfg, "score", mesh=mesh)
    if cfg.score_model_dir:
        _load(score_agent, cfg.score_model_dir)
    # weights are pinned for the whole eval: bake them into the compiled
    # programs as constants (within noise vs state-as-argument per the
    # round-4 A/B, BASELINE.md r4; never slower, skips state marshaling)
    score_agent.freeze()
    inference_pose(cfg, score_agent, seg_path, inference_res_dir, mesh=mesh)

    print("Predict energy ...")
    energy_agent = PoseAgent(cfg, "energy", mesh=mesh)
    if cfg.energy_model_dir:
        _load(energy_agent, cfg.energy_model_dir)
    energy_agent.freeze()
    inference_energy(cfg, energy_agent, inference_res_dir, mesh=mesh)

    print("Evaluating ...")
    headline = evaluate(cfg, inference_res_dir, "results_with_energy.pkl")
    if headline:
        # machine-readable headline row (mean-class mAP at the paper's four
        # thresholds, in percent) next to the curves/logs — the reference
        # only prints these into eval_logs.txt; tools/real275_parity_runbook.sh
        # consumes this file for the north-star parity check.
        path = os.path.join(inference_res_dir, "mAP_headline.json")
        with open(path, "w") as f:
            json.dump({k: float(v) for k, v in headline.items()}, f, indent=1)
        print("headline mAP:",
              {k: round(float(v), 1) for k, v in headline.items()})


if __name__ == "__main__":
    main()
