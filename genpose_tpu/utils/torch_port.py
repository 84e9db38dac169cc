"""Port reference GenPose torch checkpoints into flax variables.

The reference releases ``ckpt_epoch{N}.pth`` files holding a ``GFObjectPose``
``state_dict`` (``networks/posenet_agent.py:117-141``).  This module maps that
state_dict onto this framework's flax parameter tree so released checkpoints
can validate activations and, with NOCS data, real mAP parity
(SURVEY.md §7 build-order item 4 — a test fixture AND a migration tool).

Key layout differences handled here:

- torch ``nn.Linear``/1x1-conv weights are ``[out, in]`` / ``[out, in, 1(,1)]``;
  flax ``Dense`` kernels are ``[in, out]`` -> transpose (+ squeeze).
- the reference's fusion tails are single Linears over the concat
  ``[pts_feat, t_feat, pose_feat]`` (``scorenet.py:204``); this framework
  splits that kernel into pts/t/pose row blocks (``models/layers.py``
  ``SplitTail``/``FusedTails``/``PerPointTail``) so samplers can hoist the
  loop-invariant pts projection.  Porting slices the torch kernel's rows
  into those blocks; ``FusedTails`` additionally banks the K tails' blocks
  side by side in one wide kernel.
- torch BatchNorm ``weight/bias`` -> flax ``scale/bias`` params;
  ``running_mean/var`` -> the ``batch_stats`` collection.

Everything operates on numpy; ``torch`` is only needed by
:func:`load_torch_checkpoint` (reading ``.pth`` files).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _dense(sd: Dict[str, Any], key: str) -> Dict[str, np.ndarray]:
    """torch Linear / 1x1 conv -> flax Dense {kernel, bias}."""
    w = _np(sd[f"{key}.weight"])
    w = w.reshape(w.shape[0], w.shape[1])  # drop trailing 1x(1) conv dims
    out = {"kernel": np.ascontiguousarray(w.T)}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _bn(sd: Dict[str, Any], key: str) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """torch BatchNorm -> (flax params {scale,bias}, batch_stats {mean,var})."""
    params = {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}
    stats = {"mean": _np(sd[f"{key}.running_mean"]),
             "var": _np(sd[f"{key}.running_var"])}
    return params, stats


def _check_like(template, ported, path="") -> None:
    """Assert ported matches the template tree's keys and shapes exactly."""
    t_keys, p_keys = set(template.keys()), set(ported.keys())
    if t_keys != p_keys:
        raise ValueError(
            f"key mismatch at {path or '<root>'}: missing={t_keys - p_keys}, "
            f"extra={p_keys - t_keys}")
    for k in t_keys:
        t, p = template[k], ported[k]
        if isinstance(t, dict):
            _check_like(t, p, f"{path}/{k}")
        else:
            if tuple(np.shape(t)) != tuple(np.shape(p)):
                raise ValueError(
                    f"shape mismatch at {path}/{k}: template "
                    f"{np.shape(t)} vs ported {np.shape(p)}")


# ---------------------------------------------------------------------------
# trunk (score / energy head)
# ---------------------------------------------------------------------------

_TAIL_NAMES = {
    "RT": (("tail", "fusion_tail", 512),),
    "R_and_T": (("tail_rot", "fusion_tail_rot", 256),
                ("tail_trans", "fusion_tail_trans", 256)),
    "Rx_Ry_and_T": (("tail_rot_x", "fusion_tail_rot_x", 256),
                    ("tail_rot_y", "fusion_tail_rot_y", 256),
                    ("tail_trans", "fusion_tail_trans", 256)),
}


def port_trunk(
    sd: Dict[str, Any],
    prefix: str,
    regression_head: str = "Rx_Ry_and_T",
    per_point_feature: bool = False,
    pts_feat_dim: int = 1280,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Port a PoseScoreNet/PoseEnergyNet state_dict slice to a flax
    ``PoseTrunk`` (params, batch_stats).

    ``prefix`` is the torch key prefix, e.g. ``"pose_score_net."``.
    """
    params: Dict[str, Any] = {
        "t_fourier": {"W": _np(sd[f"{prefix}t_encoder.0.W"])},
        "t_dense": _dense(sd, f"{prefix}t_encoder.1"),
        "pose_dense_0": _dense(sd, f"{prefix}pose_encoder.0"),
        "pose_dense_1": _dense(sd, f"{prefix}pose_encoder.2"),
    }
    stats: Dict[str, Any] = {}
    specs = _TAIL_NAMES[regression_head]

    if per_point_feature:
        if regression_head != "Rx_Ry_and_T":
            raise NotImplementedError("per_point_feature requires Rx_Ry_and_T")
        for flax_name, torch_name, _ in specs:
            tp: Dict[str, Any] = {}
            ts: Dict[str, Any] = {}
            w1 = _np(sd[f"{prefix}{torch_name}.conv1.weight"])  # [1024, f, 1]
            w1 = w1.reshape(w1.shape[0], w1.shape[1]).T  # [f, 1024]
            # concat order [pts, t, pose] (ref scorenet.py:202)
            tp["feat_kernel"] = np.ascontiguousarray(w1[:pts_feat_dim])
            tp["t_kernel"] = np.ascontiguousarray(
                w1[pts_feat_dim:pts_feat_dim + 128])
            tp["pose_kernel"] = np.ascontiguousarray(w1[pts_feat_dim + 128:])
            tp["bias1"] = _np(sd[f"{prefix}{torch_name}.conv1.bias"])
            for j in (1, 2, 3):
                bn_p, bn_s = _bn(sd, f"{prefix}{torch_name}.bn{j}")
                tp[f"bn{j}"], ts[f"bn{j}"] = bn_p, bn_s
            for j in (2, 3, 4):
                tp[f"conv{j}"] = _dense(sd, f"{prefix}{torch_name}.conv{j}")
            params[flax_name] = tp
            stats[flax_name] = ts
        return params, stats

    params.update(_port_tails(sd, prefix, specs))
    return params, stats


def _port_tails(sd: Dict[str, Any], prefix: str, specs) -> Dict[str, Any]:
    """Port fusion tails shared by the score/energy trunk AND the EDM decoder
    (identical torch shapes, ``scorenet.py:118-176`` and ``:261-312``): each
    tail is Linear(1024+128+256 -> H) + ReLU + Linear(H -> out); the first
    kernel's rows are split into [pts, t-or-sigma, pose] blocks."""
    w1s, b1s, w2s, b2s = [], [], [], []
    for _, torch_name, _ in specs:
        w1s.append(_np(sd[f"{prefix}{torch_name}.0.weight"]).T)  # [1408, H]
        b1s.append(_np(sd[f"{prefix}{torch_name}.0.bias"]))
        w2s.append(_np(sd[f"{prefix}{torch_name}.2.weight"]).T)  # [H, out]
        b2s.append(_np(sd[f"{prefix}{torch_name}.2.bias"]))

    hidden_outs = {(w.shape[1], o.shape[1]) for w, o in zip(w1s, w2s)}
    if len(hidden_outs) == 1:
        # FusedTails bank: K tails' kernels side by side (models/layers.py)
        w1 = np.concatenate(w1s, axis=1)  # [1408, K*H]
        return {"tails": {
            "feat_kernel": np.ascontiguousarray(w1[:1024]),
            "t_kernel": np.ascontiguousarray(w1[1024:1152]),
            "pose_kernel": np.ascontiguousarray(w1[1152:]),
            "bias": np.concatenate(b1s, axis=0),
            "out_kernel": np.stack(w2s, axis=0),  # [K, H, out]
            "out_bias": np.stack(b2s, axis=0),
        }}
    params: Dict[str, Any] = {}
    for (flax_name, _, _), w1, b1, w2, b2 in zip(specs, w1s, b1s, w2s, b2s):
        params[flax_name] = {
            "feat": {"kernel": np.ascontiguousarray(w1[:1024])},
            "dyn": {"kernel": np.ascontiguousarray(w1[1024:]), "bias": b1},
            "out": {"kernel": w2, "bias": b2},
        }
    return params


def port_decoder(
    sd: Dict[str, Any], prefix: str, regression_head: str = "Rx_Ry_and_T"
) -> Dict[str, Any]:
    """Port a torch ``PoseDecoderNet`` (ref ``scorenet.py:225-364``)
    state_dict slice to flax ``PoseDecoderNet`` params (no batch stats; the
    decoder has no BN).  torch names: ``sigma_encoder.1`` (the Dense after
    the parameter-free PositionalEmbedding), ``pose_encoder.0/.2``,
    ``fusion_tail*``."""
    params: Dict[str, Any] = {
        "sigma_dense": _dense(sd, f"{prefix}sigma_encoder.1"),
        "pose_dense_0": _dense(sd, f"{prefix}pose_encoder.0"),
        "pose_dense_1": _dense(sd, f"{prefix}pose_encoder.2"),
    }
    params.update(_port_tails(sd, prefix, _TAIL_NAMES[regression_head]))
    return params


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------

def port_pointnet2(
    sd: Dict[str, Any], prefix: str
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Port a torch ``Pointnet2ClsMSG`` (``pts_encoder/pointnet2.py:166-211``)
    state_dict slice to the flax ``Pointnet2ClsMSG`` (params, batch_stats).

    torch keys: ``SA_modules.{k}.mlps.{i}.layer{j}.conv.weight`` (+
    ``.layer{j}.bn.bn.*``); flax: ``sa_{k}/mlp_{i}/dense_{j}`` + ``bn_{j}``.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    k = 0
    while f"{prefix}SA_modules.{k}.mlps.0.layer0.conv.weight" in sd:
        sa_p: Dict[str, Any] = {}
        sa_s: Dict[str, Any] = {}
        i = 0
        while f"{prefix}SA_modules.{k}.mlps.{i}.layer0.conv.weight" in sd:
            mlp_p: Dict[str, Any] = {}
            mlp_s: Dict[str, Any] = {}
            j = 0
            while f"{prefix}SA_modules.{k}.mlps.{i}.layer{j}.conv.weight" in sd:
                base = f"{prefix}SA_modules.{k}.mlps.{i}.layer{j}"
                mlp_p[f"dense_{j}"] = _dense(sd, f"{base}.conv")
                if f"{base}.bn.bn.weight" in sd:
                    bn_p, bn_s = _bn(sd, f"{base}.bn.bn")
                    mlp_p[f"bn_{j}"], mlp_s[f"bn_{j}"] = bn_p, bn_s
                j += 1
            sa_p[f"mlp_{i}"] = mlp_p
            if mlp_s:
                sa_s[f"mlp_{i}"] = mlp_s
            i += 1
        params[f"sa_{k}"] = sa_p
        if sa_s:
            stats[f"sa_{k}"] = sa_s
        k += 1
    if not params:
        raise KeyError(f"no SA_modules found under prefix {prefix!r}")
    return params, stats


def port_pointnet(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """Port a torch ``PointNetfeat`` (``pts_encoder/pointnets.py:83-123``)
    slice to the flax ``PointNetfeat`` params (no BN in either)."""
    stn = {}
    for dst, src in (("Dense_0", "conv1"), ("Dense_1", "conv2"),
                     ("Dense_2", "conv3"), ("Dense_3", "fc1"),
                     ("Dense_4", "fc2"), ("Dense_5", "fc3")):
        stn[dst] = _dense(sd, f"{prefix}stn.{src}")
    params: Dict[str, Any] = {"stn": stn}
    for dst, src in (("Dense_0", "conv1"), ("Dense_1", "conv2"),
                     ("Dense_2", "conv3"), ("Dense_3", "conv4")):
        params[dst] = _dense(sd, f"{prefix}{src}")
    return params


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def port_gf_state_dict(
    sd: Dict[str, Any],
    variables: Dict[str, Any],
    pts_encoder: str = "pointnet2",
    regression_head: str = "Rx_Ry_and_T",
    per_point_feature: bool = False,
    pts_feat_dim: int = 1280,
    decoder_head: bool = False,
) -> Dict[str, Any]:
    """Port a full torch ``GFObjectPose`` state_dict onto the flax
    ``GFObjectPose`` variables template (from ``model.init``).

    Works for both score and energy models (the reference names the head
    ``pose_score_net`` in both modes, ``posenet.py:59-67``).  Returns
    ``{"params": ..., "batch_stats": ...}`` with the template's exact
    structure; raises on any key/shape mismatch.
    """
    sd = {k: _np(v) for k, v in sd.items()
          if not k.endswith("num_batches_tracked")}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    if pts_encoder == "pointnet2":
        enc_p, enc_s = port_pointnet2(sd, "pts_encoder.")
        params["encoder"], stats["encoder"] = enc_p, enc_s
    elif pts_encoder == "pointnet":
        params["encoder"] = port_pointnet(sd, "pts_encoder.")
    elif pts_encoder == "pointnet_and_pointnet2":
        params["encoder_pn"] = port_pointnet(sd, "pts_pointnet_encoder.")
        enc_p, enc_s = port_pointnet2(sd, "pts_pointnet2_encoder.")
        params["encoder_pn2"], stats["encoder_pn2"] = enc_p, enc_s
        params["fusion_layer"] = _dense(sd, "fusion_layer")
    else:
        raise NotImplementedError(pts_encoder)

    if decoder_head:
        # EDM decoder head: its params sit directly under "head" (no trunk)
        params["head"] = port_decoder(sd, "pose_score_net.",
                                      regression_head=regression_head)
    else:
        trunk_p, trunk_s = port_trunk(
            sd, "pose_score_net.", regression_head=regression_head,
            per_point_feature=per_point_feature, pts_feat_dim=pts_feat_dim)
        params["head"] = {"trunk": trunk_p}
        if trunk_s:
            stats["head"] = {"trunk": trunk_s}

    _check_like(variables["params"], params)
    template_stats = variables.get("batch_stats", {})
    if template_stats:
        _check_like(template_stats, stats)
    out = {"params": params}
    if template_stats:
        out["batch_stats"] = stats
    return out


def port_checkpoint_file(
    input_path: str,
    output_dir: str,
    cfg,
    posenet_mode: str = "score",
    epoch: Optional[int] = None,
) -> str:
    """Convert a reference ``.pth`` checkpoint into an orbax checkpoint
    loadable by :func:`genpose_tpu.training.checkpoints.load_checkpoint`.

    The reference saves the EMA-swapped weights as the model weights
    (``posenet_agent.py:124-126``), so the ported params populate BOTH the
    live params and the EMA shadow.  Returns the written checkpoint path.
    """
    from genpose_tpu.training.agent import PoseAgent
    from genpose_tpu.training.checkpoints import save_checkpoint

    sd, clock = load_torch_checkpoint(input_path)
    agent = PoseAgent(cfg, posenet_mode)
    variables = port_gf_state_dict(
        sd, agent.state.variables, pts_encoder=cfg.pts_encoder,
        regression_head=cfg.regression_head)
    state = agent.state.replace(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", agent.state.batch_stats),
        ema=agent.state.ema.replace(shadow=variables["params"]),
    )
    if epoch is None:
        epoch = int(clock["epoch"]) if clock and "epoch" in clock else 0
    return save_checkpoint(output_dir, state, epoch, clock=clock)


def load_torch_checkpoint(path: str) -> Tuple[Dict[str, np.ndarray], Optional[dict]]:
    """Read a reference ``.pth`` checkpoint -> (numpy state_dict, clock).

    Accepts both the full training checkpoint dict
    (``{'clock', 'model_state_dict', ...}``, ``posenet_agent.py:131-136``)
    and a bare state_dict.
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    clock = None
    if isinstance(blob, dict) and "model_state_dict" in blob:
        clock = blob.get("clock")
        blob = blob["model_state_dict"]
    return {k: _np(v) for k, v in blob.items()}, clock
