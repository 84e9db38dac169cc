"""Pose-tracking evaluation (re-design of ``runners/evaluation_tracking.py``).

Frame-by-frame over the sorted Real test list: the previous frame's averaged
pose (matched by model name) seeds the sampler as ``init_x`` with a reduced
start time ``T0`` (0.15 in ``scripts/eval_tracking.sh``); unseen objects
start from the noised GT (``add_noise_to_RT``).  Hypotheses are energy-sorted
and the top-60% quaternion-averaged; per-class mean (deg, cm) errors and
5deg5cm accuracy are reported (ref ``:221-245, 262-337``).
"""

from __future__ import annotations

import os
import pickle
import sys
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from genpose_tpu.config import Config, enable_compile_cache, get_config
from genpose_tpu.eval.metrics import compute_RT_errors
from genpose_tpu.ops.pose import (
    average_quaternion_batch,
    matrix_to_quat_wxyz,
    quat_wxyz_to_matrix,
)
from genpose_tpu.runners.evaluation_single import (
    REAL_K,
    _instance_points,
    _zero_center_batch,
)
from genpose_tpu.data.dataset_utils import load_depth
from genpose_tpu.training.agent import PoseAgent
from genpose_tpu.training.checkpoints import load_checkpoint
from genpose_tpu.training.ranking import sort_poses_by_energy
from genpose_tpu.utils.tracking import add_noise_to_RT, srt_to_pose9d


def cal_average_sRT(sRT: np.ndarray, selected_num: int) -> np.ndarray:
    """Quaternion-average the first ``selected_num`` hypotheses
    (ref ``evaluation_tracking.py:60-77``)."""
    bs = sRT.shape[0]
    sel = jnp.asarray(sRT[:, :selected_num].reshape(bs * selected_num, 4, 4))
    quat = matrix_to_quat_wxyz(sel[:, :3, :3]).reshape(bs, selected_num, 4)
    trans = sel[:, :3, 3].reshape(bs, selected_num, 3)
    avg_q = average_quaternion_batch(quat)
    avg_t = jnp.mean(trans, axis=1)
    out = np.tile(np.identity(4), (bs, 1, 1))
    out[:, :3, :3] = np.asarray(quat_wxyz_to_matrix(avg_q))
    out[:, :3, 3] = np.asarray(avg_t)
    return out


def extract_single_frame_data(cfg: Config, path: str, rng) -> Optional[dict]:
    """mrcnn tracking pkl -> per-instance clouds (ref ``:110-186``)."""
    img_path = os.path.join(cfg.data_path, path)
    raw_depth = load_depth(img_path)
    parts = img_path.split("/")
    mrcnn_path = os.path.join(
        cfg.result_dir, "mrcnn_results", cfg.test_source,
        "results_{}_{}_{}.pkl".format(cfg.test_source.split("_")[-1],
                                      parts[-2], parts[-1]))
    with open(mrcnn_path, "rb") as f:
        mrcnn_result = pickle.load(f)
    num_insts = len(mrcnn_result["pred"]["class_ids"])

    # every per-instance field is filtered by the SAME keep mask — the
    # downstream loop indexes pred rows, gt poses, and model names with a
    # single instance index, so a dropped detection must drop everywhere
    f_points, f_catId, f_gt, f_names, f_hv, f_seen = [], [], [], [], [], []
    seen = mrcnn_result["pred"].get("seen")
    for i in range(num_insts):
        mask = np.logical_and(mrcnn_result["pred"]["masks"][:, :, i],
                              raw_depth > 0)
        pts = _instance_points(
            raw_depth, mask, mrcnn_result["pred"]["rois"][i], REAL_K,
            cfg.img_size, cfg.num_points, rng)
        if pts is None:
            continue
        # normalize away any scale in the GT pose (ref :175)
        gtp = np.array(mrcnn_result["gt"]["poses"][i])
        gtp[:3, :3] = gtp[:3, :3] / np.linalg.norm(gtp[:3, 0])
        f_points.append(pts)
        f_catId.append(mrcnn_result["pred"]["class_ids"][i] - 1)
        f_gt.append(gtp)
        f_names.append(mrcnn_result["gt"]["model_list"][i])
        f_hv.append(mrcnn_result["gt"]["handle_visibility"][i])
        if seen is not None:
            f_seen.append(seen[i])

    if not f_points:
        return None
    return {
        "gt_handle_visibility": np.asarray(f_hv),
        "gt_pose": np.asarray(f_gt),
        # extracted for pkl-format parity; neither driver consumes it —
        # the reference also reads 'seen' into 'tracked' and then seeds
        # purely by model-name matching (evaluation_tracking.py:183,302-310)
        "tracked": f_seen if seen is not None else None,
        "model_name": f_names,
        "pts": f_points,
        "cat_id": f_catId,
    }


def aggregate_tracking_metrics(errors: Dict[str, list]) -> Dict[str, dict]:
    """Per-class mean error + 5deg5cm accuracy (ref ``:221-245``)."""
    cls: Dict[str, np.ndarray] = {}
    for key, errs in errors.items():
        cls_name = key.split("_")[0]
        arr = np.array(errs)
        cls[cls_name] = arr if cls_name not in cls else np.concatenate(
            [cls[cls_name], arr], axis=0)
    metrics: Dict[str, dict] = {}
    for name, errs in cls.items():
        metrics[name] = {
            "mean_error": np.mean(errs, axis=0),
            "5d5cm_acc": float(np.sum(
                np.logical_and(errs[:, 0] <= 5, errs[:, 1] <= 5)) / errs.shape[0]),
        }
    n = len(metrics)
    total = {"mean_error": 0.0, "5d5cm_acc": 0.0}
    for name, m in metrics.items():
        total["mean_error"] = total["mean_error"] + m["mean_error"] / n
        total["5d5cm_acc"] += m["5d5cm_acc"] / n
    metrics["all"] = total
    return metrics


def main_tracking(cfg: Config, tracking: bool = True, T0: float = 0.15):
    """Sequential frame driver (ref ``evaluation_tracking.py:262-337``)."""
    rng = np.random.default_rng(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)

    score_agent = PoseAgent(cfg, "score")
    energy_agent = PoseAgent(cfg, "energy")
    if cfg.score_model_dir:
        score_agent.state = load_checkpoint(
            os.path.join("results", "ckpts", cfg.score_model_dir),
            score_agent.state, load_model_only=True)
    if cfg.energy_model_dir:
        energy_agent.state = load_checkpoint(
            os.path.join("results", "ckpts", cfg.energy_model_dir),
            energy_agent.state, load_model_only=True)

    file_path = "Real/test_list.txt"
    with open(os.path.join(cfg.data_path, file_path)) as f:
        img_list = sorted(
            os.path.join("Real", line.rstrip("\n")) for line in f)

    errors: Dict[str, list] = {}
    buffer = {"model_name": [], "pred_sRT": None}

    K = cfg.eval_repeat_num
    keep = max(1, int(0.6 * K))
    sampler = cfg.sampler_mode[0] if cfg.sampler_mode else "ode"

    # The states are pinned for the whole tracking run, so close them over
    # as compile-time constants (same trick as InferencePipeline.freeze();
    # within noise vs state-as-argument per the round-4 A/B, BASELINE.md r4,
    # but never slower and skips per-dispatch state marshaling).
    s_state, e_state = score_agent.state, energy_agent.state

    @jax.jit
    def frame_pipeline(batch, init_pose, k):
        """The whole per-frame device chain in ONE dispatch: shared-geometry
        K-hypothesis sampling (init_x + T0 prior) -> energies -> decoupled
        sort -> top-60% quaternion-average pool.  An eager chain here costs
        ~25 ms of tunnel RPC PER OP on remote backends — fusing it is what
        makes the sequential frame loop device-bound rather than
        dispatch-bound."""
        geom = score_agent.pts_geometry(batch["zero_mean_pts"])
        pred = score_agent._sample_impl(
            s_state, batch, k, repeat_num=K, sampler=sampler,
            num_steps=cfg.sampling_steps, T0=T0, init_x=init_pose,
            geometry=geom)
        n = batch["zero_mean_pts"].shape[0]
        t_in = jnp.full((n, K), 1e-5)
        energy = energy_agent._get_energy_impl(e_state, batch, pred, t_in,
                                               geometry=geom)
        sorted_pose, _ = sort_poses_by_energy(pred, energy)
        # same math as cal_average_sRT on the top-keep hypotheses, on device
        _, avg = score_agent.aggregate_hypotheses(sorted_pose[:, :keep])
        # Only the pooled pose leaves the program: returning the full
        # [N_pad, K, d] sorted hypothesis set would force XLA to materialize
        # an output buffer nothing downstream reads (advisor finding, r2/r3).
        return quat_wxyz_to_matrix(avg[:, :4]), avg[:, 4:]

    # Overlap host-side frame decode (pkl/png -> instance clouds) with the
    # device pipeline: while frame N's fused dispatch runs, a single worker
    # thread extracts frame N+1, so frame time approaches
    # max(host, device) instead of their sum.  The extraction touches only
    # (cfg, path, rng); rng is used exclusively by this worker thread, one
    # frame at a time, so the sampled-point stream stays sequential and
    # deterministic.  The pose prior only needs the PREVIOUS frame's result,
    # which is ready before the next iteration begins.
    pool = ThreadPoolExecutor(max_workers=1)
    fut = (pool.submit(extract_single_frame_data, cfg, img_list[0], rng)
           if img_list else None)
    # A frame error (corrupt pkl surfacing via fut.result(), device failure)
    # must not leak the worker thread: the finally cancels the in-flight
    # decode instead of blocking interpreter shutdown on it.
    try:
        for idx in range(len(img_list)):
            frame = fut.result()
            fut = (pool.submit(extract_single_frame_data, cfg,
                               img_list[idx + 1], rng)
                   if idx + 1 < len(img_list) else None)
            if frame is None:
                continue
            batch = _zero_center_batch(np.asarray(frame["pts"]))

            init_pose = None
            if tracking:
                key, k_n = jax.random.split(key)
                init_sRT = np.array(add_noise_to_RT(
                    k_n, jnp.asarray(np.asarray(frame["gt_pose"], np.float32))))
                for i, name in enumerate(frame["model_name"]):
                    if name in buffer["model_name"]:
                        init_sRT[i] = buffer["pred_sRT"][
                            buffer["model_name"].index(name)]
                init_pose = srt_to_pose9d(jnp.asarray(init_sRT))
                init_pose = init_pose.at[:, -3:].add(-batch["pts_center"])

            # Pad the instance axis to a power-of-two bucket so the jitted
            # sampler/energy pipeline compiles once per bucket (<= log2
            # shapes) instead of once per distinct per-frame detection count
            # — each compile costs minutes server-side on a tunneled
            # backend.  Padded rows repeat the last instance and are sliced
            # away below.
            N = int(batch["zero_mean_pts"].shape[0])
            n_pad = (1 << (N - 1).bit_length()) - N
            if n_pad:
                batch = {k: jnp.concatenate(
                    [v, jnp.repeat(v[-1:], n_pad, axis=0)])
                    for k, v in batch.items()}
                if init_pose is not None:
                    init_pose = jnp.concatenate(
                        [init_pose, jnp.repeat(init_pose[-1:], n_pad, axis=0)])

            key, k_s = jax.random.split(key)
            avg_R, avg_t = frame_pipeline(batch, init_pose, k_s)

            avg_sRT = np.tile(np.identity(4), (N, 1, 1))
            avg_sRT[:, :3, :3] = np.asarray(avg_R)[:N]
            avg_sRT[:, :3, 3] = np.asarray(avg_t)[:N]
            buffer["model_name"] = frame["model_name"]
            buffer["pred_sRT"] = avg_sRT

            for i in range(avg_sRT.shape[0]):
                rt_err = compute_RT_errors(
                    avg_sRT[i], frame["gt_pose"][i], int(frame["cat_id"][i]),
                    frame["gt_handle_visibility"][i], cfg.synset_names)
                errors.setdefault(frame["model_name"][i], []).append(
                    np.asarray(rt_err).tolist())
    finally:
        pool.shutdown(wait=False, cancel_futures=True)
    metrics = aggregate_tracking_metrics(errors)
    save_dir = os.path.join(
        cfg.result_dir, "evaluation_results",
        f"{cfg.test_source}_repeat_{cfg.eval_repeat_num}", "results",
        cfg.pooling_mode, cfg.ranker)
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, "eval_logs.txt"), "w") as fw:
        for key_name, m in metrics.items():
            fw.write(key_name + "\n")
            print(key_name)
            for sub, v in m.items():
                fw.write(f"{sub}: {v}\n")
                print(f"{sub}: {v}")
    return metrics


def main(argv=None):
    cfg = get_config(argv if argv is not None else sys.argv[1:])
    enable_compile_cache(cfg)
    main_tracking(cfg, tracking=True, T0=cfg.T0)


if __name__ == "__main__":
    main()
