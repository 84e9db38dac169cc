"""End-to-end eval pipeline stages on the 8-device CPU mesh.

Covers the mesh-sharded inference path of ``runners/evaluation_single.py``
(stage 2 + 3): the (instances x K) axis sharded over ``dp``, params
replicated — the TPU-native replacement for the reference's single-GPU
per-category loop (``evaluation_single.py:356-489``).
"""

import os
import pickle

import jax
import numpy as np
import pytest

from genpose_tpu.config import get_config
from genpose_tpu.data.synthetic import (
    make_synthetic_mrcnn_results,
    make_synthetic_nocs_dir,
)
from genpose_tpu.parallel.mesh import make_mesh
from genpose_tpu.runners import evaluation_single as ev
from genpose_tpu.training.agent import PoseAgent


@pytest.fixture(scope="module")
def eval_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("evaltree")
    nocs = make_synthetic_nocs_dir(str(root / "nocs"), n_camera_scenes=1,
                                   n_real_scenes=2, seed=11)
    make_synthetic_mrcnn_results(nocs, str(root / "results"), "real_test")
    return nocs, str(root / "results"), root


def test_sharded_inference_stages(eval_tree, tmp_path, monkeypatch):
    nocs, mrcnn, root = eval_tree
    monkeypatch.chdir(tmp_path)
    cfg = get_config([
        "--data_path", nocs, "--result_dir", mrcnn,
        "--test_source", "real_test", "--eval_repeat_num", "4",
        "--sampling_steps", "4", "--batch_size", "8", "--num_points", "64",
    ])
    mesh = make_mesh(8)

    seg_path = str(tmp_path / "seg.pkl")
    ev.detect_mrcnn_genpose(cfg, seg_path)
    assert os.path.exists(seg_path)

    out_dir = str(tmp_path / "infer")
    score_agent = PoseAgent(cfg, "score", mesh=mesh)
    ev.inference_pose(cfg, score_agent, seg_path, out_dir, mesh=mesh)
    with open(os.path.join(out_dir, "results_wo_energy.pkl"), "rb") as f:
        wo = pickle.load(f)
    some = next(iter(wo.values()))["result"]
    n_inst = some["pred_RTs"].shape[0]
    assert some["multi_hypothesis_pred_RTs"].shape == (n_inst, 4, 4, 4)
    assert np.isfinite(some["multi_hypothesis_pred_RTs"]).all()

    energy_agent = PoseAgent(cfg, "energy", mesh=mesh)
    ev.inference_energy(cfg, energy_agent, out_dir, mesh=mesh)
    with open(os.path.join(out_dir, "results_with_energy.pkl"), "rb") as f:
        we = pickle.load(f)
    some = next(iter(we.values()))["result"]
    assert some["energy"].shape[1] == 4
    assert np.isfinite(some["energy"]).all()
