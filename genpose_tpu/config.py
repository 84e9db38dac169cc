"""Configuration tree for genpose_tpu.

Replaces the reference's argparse monolith (``configs/config.py:4-112``) with a
plain dataclass so that no module imports flags at module scope (the reference
couples the encoder width to a global CLI parse at
``networks/pts_encoder/pointnet2.py:13``; here the encoder takes its config as
an argument).

Defaults mirror the reference defaults / the released training scripts
(``scripts/train_score.sh``, ``scripts/train_energy.sh``,
``scripts/eval_single.sh``).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


@dataclass(frozen=True)
class DynamicZoomInConfig:
    """DZI bbox jitter parameters (reference ``configs/config.py:90-95``)."""

    pad_scale: float = 1.5
    dzi_type: str = "uniform"
    scale_ratio: float = 0.25
    shift_ratio: float = 0.25


@dataclass(frozen=True)
class PtsAugConfig:
    """Batched 3D augmentation probabilities (reference ``configs/config.py:97-104``)."""

    aug_pc_pro: float = 0.2   # per-point jitter probability
    aug_pc_r: float = 0.2     # per-point jitter range
    aug_rt_pro: float = 0.3   # random rotation/translation probability
    aug_bb_pro: float = 0.3   # bbox-based anisotropic scaling probability
    aug_bc_pro: float = 0.3   # bowl/mug box-cage deformation probability


@dataclass(frozen=True)
class Deform2DConfig:
    """2D mask deformation parameters (reference ``configs/config.py:106-110``)."""

    roi_mask_r: int = 3
    roi_mask_pro: float = 0.5


@dataclass
class Config:
    """Full configuration (reference ``configs/config.py:4-112``)."""

    # ---- dataset ----
    synset_names: Tuple[str, ...] = ("bottle", "bowl", "camera", "can", "laptop", "mug")
    selected_classes: Optional[Tuple[str, ...]] = None
    data_path: str = ""
    o2c_pose: bool = True
    batch_size: int = 192
    # accepted for reference-script compatibility; unused THERE too
    # (defined at config.py:13, read nowhere in the reference)
    max_batch_size: int = 192
    mini_bs: int = 192
    pose_mode: str = "rot_matrix"
    seed: int = 0
    percentage_data_for_train: float = 1.0
    percentage_data_for_val: float = 1.0
    percentage_data_for_test: float = 1.0
    train_source: str = "CAMERA+Real"
    val_source: str = "CAMERA"
    test_source: str = "Real"
    device: str = "tpu"
    num_points: int = 1024
    per_obj: str = ""
    num_workers: int = 8
    # loader worker pool kind: 'thread' (GIL-releasing cv2/np) or 'process'
    # (the reference's 32-process shape, ``datasets_genpose.py:558-566``)
    loader_mode: str = "thread"

    # ---- model ----
    posenet_mode: str = "score"
    hidden_dim: int = 128
    sampler_mode: Tuple[str, ...] = ("ode",)
    sampling_steps: int = 500
    sde_mode: str = "ve"
    sigma: float = 25.0
    likelihood_weighting: bool = False
    regression_head: str = "Rx_Ry_and_T"
    pointnet2_params: str = "light"
    pts_encoder: str = "pointnet2"
    energy_mode: str = "IP"
    s_theta_mode: str = "score"
    norm_energy: str = "identical"

    # ---- training ----
    agent_type: str = "score"  # one of [score, energy, energy_with_ranking]
    pretrained_score_model_path: Optional[str] = None
    pretrained_energy_model_path: Optional[str] = None
    distillation: bool = False
    n_epochs: int = 1000
    log_dir: str = "debug"
    optimizer: str = "Adam"
    eval_freq: int = 100
    repeat_num: int = 20
    grad_clip: float = 1.0
    ema_rate: float = 0.999
    lr: float = 1e-3
    warmup: int = 100
    lr_decay: float = 0.98
    lr_floor: float = 1e-4  # decay is frozen below this lr (posenet_agent.py:549)
    use_pretrain: bool = False
    # TPU parallelism: number of data-parallel devices (mesh axis "dp").
    # Replaces the reference's --parallel/--num_gpu DataParallel flags.
    num_devices: int = 0  # 0 => use all available
    is_train: bool = False

    # ---- precision / performance (TPU-specific) ----
    # Compute dtype for the encoder/score-net matmuls; params stay f32.
    compute_dtype: str = "float32"  # or "bfloat16"
    # Head compute dtype: "compute" follows compute_dtype (serving default);
    # "float32" keeps the pose/time heads f32.  NOTE: bf16 training stalls
    # rotation learning at full model size even with f32 heads — train in
    # f32 (see models/posenet.py::GFObjectPose.head_dtype, BASELINE.md r3).
    head_dtype: str = "compute"
    # Backward precision for the encoder's feature gathers: "exact" inherits
    # the forward's 6-pass HIGHEST scatter-add via autodiff; "fast" runs it
    # in a single DEFAULT MXU pass (gradient contributions bf16-rounded,
    # f32-accumulated — the loss/forward is unchanged and gradients are not
    # a parity surface).  Default "fast": on-chip A/B gives +14% train step
    # (1302 -> 1483 samples/s) with identical convergence (DSM 9.0 -> 1.5,
    # rot 124 -> 31 deg in 3000 steps, matching exact's 1.4 / 33 deg;
    # BASELINE.md r3).  See ops/pointcloud.py::_row_gather_fast_bwd.
    gather_grad: str = "fast"
    # Forward precision for the encoder's feature gathers DURING TRAINING
    # (train=True only — eval/serving numerics are untouched either way):
    # "exact" = 6-pass HIGHEST one-hot einsum (bit-exact f32 gather, the
    # parity lowering); "fast" = single DEFAULT MXU pass (gathered values
    # bf16-rounded, f32-accumulated).  Unlike gather_grad this perturbs the
    # training LOSS numerics, so it was gated on an on-chip convergence A/B:
    # the 3000-step full-size check converges identically (DSM 9.0 -> 1.5,
    # rot 124 -> 31.1 deg, trans -> 26.5 cm — same to print precision as
    # exact) and the step gets +4.4% on top of gather_grad=fast
    # (1475 -> 1540 samples/s; BASELINE.md r3).  Default "fast";
    # `--gather_fwd exact` restores bit-exact f32 training gathers.  No-op
    # for bf16 compute where DEFAULT is already exact.
    gather_fwd: str = "fast"
    # BatchNorm compute dtype inside the encoder SharedMLPs: "compute"
    # follows compute_dtype; "float32" normalizes (batch statistics AND the
    # scale/shift) in f32 and casts back.  MEASURED FINDING (round 4): on
    # this flax version the knob is BIT-IDENTICAL to bf16 BN — flax already
    # computes BatchNorm statistics and arithmetic in f32 and only casts the
    # output (pinned by tests/test_precision_knobs.py), so BN precision is
    # excluded as the cause of the r3 bf16 rotation-learning failure.  Kept
    # as insurance against flax changing that behavior.
    bn_dtype: str = "compute"
    # Dtype of the PointNet++ grouped-coordinate geometry (sa_geometry):
    # "compute" follows compute_dtype (bf16 pipelines gather bf16-rounded
    # coordinates in one MXU pass — the serving default, BASELINE.md r2);
    # "float32" keeps the exact 6-pass f32 gathers and f32 centered offsets
    # even under bf16 compute (they are rounded once at the first SharedMLP
    # matmul instead of pre-rounded at the gather).  Added for the round-4
    # bf16-training sweep.  No-op when compute_dtype is float32.
    geometry_dtype: str = "compute"
    # Run the FIRST N (>=0) or LAST |N| (<0) PointNet++ SA stages (matmuls +
    # their inline geometry, unless geometry_dtype overrides) in f32 while
    # the rest follow compute_dtype — the bisection knob for WHERE bf16
    # training loses the rotation signal.  Round-4 sweep finding
    # (BASELINE.md r4): ``-2`` ("f32 last two stages") is the SUPPORTED
    # mixed-precision training config (`--compute_dtype bfloat16
    # --encoder_f32_stages -2` = 2,058 samples/s, 1.34x f32, convergence
    # matching f32); ``-1`` was the bisection probe and is RETIRED as a
    # measured rejection (rotation learns at ~half rate; slowest and only
    # non-monotone arm on the r5 wall-to-criterion A/B, BASELINE.md r5 —
    # don't re-measure).  0 = all stages at compute_dtype.
    encoder_f32_stages: int = 0
    # Persistent XLA compile cache for the runner CLIs (trainer, eval_single,
    # eval_tracking, serving warmup) — the big server-side pipeline compiles
    # (~11 min/process over the tunnel) are paid once and reused across
    # starts/resumes, the same way bench.py:37 and every profiling tool
    # already do.  Default ON; set "" (or --compile_cache_dir "") to disable.
    # Honors $GENPOSE_COMPILE_CACHE when set.
    compile_cache_dir: str = "/tmp/genpose_jax_cache"

    # ---- testing ----
    eval: bool = False
    pred: bool = False
    # run PF-ODE log-likelihood evaluation of the GT poses over the test set
    # (mode parity with the reference's 'likelihood' forward mode,
    # ``networks/posenet.py:166-168``)
    likelihood: bool = False
    model_name: Optional[str] = None
    eval_repeat_num: int = 50
    save_video: bool = False
    max_eval_num: int = 10_000_000
    results_path: str = ""
    T0: float = 1.0

    # ---- nocs mrcnn testing ----
    img_size: int = 256
    result_dir: str = ""
    model_dir_list: Optional[Tuple[str, ...]] = None
    energy_model_dir: str = ""
    score_model_dir: str = ""
    ranker: str = "energy_ranker"  # energy_ranker, gt_ranker or random
    pooling_mode: str = "nearest"  # nearest or average
    # top-ratio hypothesis selection before pooling (ref hardcodes 0.6 at
    # ``evaluation_single.py:534``); serving uses ``ratio``, the eval stage
    # sweeps ``eval_ratios``
    ratio: float = 0.6
    eval_ratios: Tuple[float, ...] = (0.6,)

    # ---- nested parameter groups ----
    dzi: DynamicZoomInConfig = field(default_factory=DynamicZoomInConfig)
    pts_aug: PtsAugConfig = field(default_factory=PtsAugConfig)
    deform_2d: Deform2DConfig = field(default_factory=Deform2DConfig)

    def __post_init__(self):
        # fail fast on knob typos: these are string enums consumed deep in
        # the agent/loader ('fp32' for head_dtype would otherwise silently
        # mean 'compute', invalidating a precision experiment).  ValueError
        # rather than assert so the guard survives python -O.
        for name, allowed in (("compute_dtype", ("float32", "bfloat16")),
                              ("head_dtype", ("compute", "float32")),
                              ("loader_mode", ("thread", "process")),
                              ("gather_grad", ("exact", "fast")),
                              ("gather_fwd", ("exact", "fast")),
                              ("bn_dtype", ("compute", "float32")),
                              ("geometry_dtype", ("compute", "float32"))):
            val = getattr(self, name)
            if val not in allowed:
                raise ValueError(f"{name}={val!r} not in {allowed}")
        if not -5 <= self.encoder_f32_stages <= 5:
            raise ValueError(
                f"encoder_f32_stages={self.encoder_f32_stages} not in [-5, 5]")

    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)


def _add_dataclass_args(parser: argparse.ArgumentParser, cls) -> None:
    for f in dataclasses.fields(cls):
        if dataclasses.is_dataclass(f.type) or f.name in ("dzi", "pts_aug", "deform_2d"):
            continue
        name = "--" + f.name
        default = f.default if f.default is not dataclasses.MISSING else None
        ftype = f.type if isinstance(f.type, str) else str(f.type)
        if f.type in ("bool", bool):
            # accept BOTH the reference's bare store_true form (--is_train,
            # config.py:63) and the explicit --is_train true/false form
            parser.add_argument(
                name, type=lambda s: s.lower() in ("1", "true", "yes"),
                nargs="?", const=True, default=default)
        elif "Tuple" in ftype or isinstance(default, tuple):
            # element type from the default tuple, else from the annotation
            # (covers Optional[Tuple[...]] fields whose default is None —
            # previously declared as a single str arg, silently dropping
            # all but the first value)
            if isinstance(default, tuple) and default:
                elem = type(default[0])
            elif "float" in ftype:
                elem = float
            elif "int" in ftype:
                elem = int
            else:
                elem = str
            parser.add_argument(name, nargs="+", type=elem, default=default)
        elif isinstance(default, int):
            parser.add_argument(name, type=int, default=default)
        elif isinstance(default, float):
            parser.add_argument(name, type=float, default=default)
        else:
            parser.add_argument(name, type=str, default=default)


def get_config(argv: Optional[List[str]] = None) -> Config:
    """Build a Config, optionally overridden from CLI-style arguments.

    Unlike the reference, this never parses ``sys.argv`` implicitly at import
    time; pass ``argv`` explicitly in entry points.
    """
    parser = argparse.ArgumentParser(description="genpose_tpu")
    _add_dataclass_args(parser, Config)
    # the reference's GPU knobs (config.py:61-62), accepted so its scripts
    # run unchanged but ignored (device parallelism here = --num_devices
    # over a jax mesh).  Everything else is parsed STRICTLY: a typo'd flag
    # must error, not silently run a multi-hour job with default values.
    parser.add_argument("--parallel", nargs="?", const="1", default=None,
                        help="ignored (reference compatibility)")
    parser.add_argument("--num_gpu", type=int, default=None,
                        help="ignored (reference compatibility)")
    ns = parser.parse_args(argv if argv is not None else [])
    for ignored in ("parallel", "num_gpu"):
        delattr(ns, ignored)
    overrides = {}
    for f in dataclasses.fields(Config):
        if f.name in ("dzi", "pts_aug", "deform_2d"):
            continue
        v = getattr(ns, f.name, None)
        if v is not None:
            if isinstance(v, list):
                v = tuple(v)
            overrides[f.name] = v
    return Config(**overrides)


def enable_compile_cache(cfg: Config) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``cfg.compile_cache_dir``
    (round-4 verdict #5: the runner CLIs never turned the cache on, so every
    trainer/eval start repaid the full server-side compile that bench.py and
    the profiling tools already avoid).  Called by every runner main and by
    ``InferencePipeline``.  Returns the directory used, or None when the
    knob is empty / the backend is already past configuration (harmless:
    compiles then simply skip the disk cache, exactly today's behavior).
    ``$GENPOSE_COMPILE_CACHE`` overrides the config value when set."""
    cache_dir = os.environ.get("GENPOSE_COMPILE_CACHE", cfg.compile_cache_dir)
    if not cache_dir:
        return None
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # the pipeline programs this exists for take minutes to build; only
        # skip truly trivial sub-second compiles (matches bench.py:39).
        # $GENPOSE_CACHE_MIN_COMPILE_SECS overrides (tests set 0 so a tiny
        # CLI run demonstrably populates the cache).
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(os.environ.get("GENPOSE_CACHE_MIN_COMPILE_SECS", "1.0")))
        if os.environ.get("GENPOSE_CACHE_MIN_COMPILE_SECS") is not None:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        # jax materializes the persistent-cache object lazily at the FIRST
        # compile and never re-reads the dir config afterwards — reset the
        # handle so a process that already compiled something (tests, a
        # library caller) still lands subsequent compiles in cache_dir
        from jax.experimental.compilation_cache import (
            compilation_cache as _cc,
        )

        _cc.reset_cache()
    except Exception:
        return None
    return cache_dir
