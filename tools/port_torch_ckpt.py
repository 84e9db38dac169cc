#!/usr/bin/env python
"""Convert a released GenPose torch checkpoint (.pth) into a genpose_tpu
orbax checkpoint.

The reference releases ``ckpt_epoch{N}.pth`` files written by
``networks/posenet_agent.py:117-141`` (a dict with ``model_state_dict`` of
the full ``GFObjectPose``).  This tool maps every weight onto the flax
parameter tree (see ``genpose_tpu/utils/torch_port.py``) and writes
``<output>/ckpt_epoch{N}`` + ``clock.json``, directly loadable by the
trainer / eval runners via ``--pretrained_score_model_path`` etc.

Usage:
    python tools/port_torch_ckpt.py \
        --input  scorenet.pth \
        --output results/ckpts/ported_score \
        --posenet_mode score \
        [--pts_encoder pointnet2 --regression_head Rx_Ry_and_T \
         --pose_mode rot_matrix --sde_mode ve --num_points 1024]
"""

import argparse
import sys


def main(argv=None):
    # force the CPU backend before anything touches jax (the image's
    # sitecustomize pins the single-chip tunnel; porting is host work)
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception as e:
        # a backend already initialized in this process: the port would
        # dispatch pure host work over the tunnel — say so instead of
        # failing opaquely later
        print(f"WARNING: could not force the CPU backend ({e}); "
              "porting will run on the default backend", file=sys.stderr)

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help=".pth checkpoint to read")
    p.add_argument("--output", required=True, help="orbax checkpoint dir")
    p.add_argument("--posenet_mode", default="score",
                   choices=["score", "energy"])
    p.add_argument("--pts_encoder", default="pointnet2")
    p.add_argument("--regression_head", default="Rx_Ry_and_T")
    p.add_argument("--pose_mode", default="rot_matrix")
    p.add_argument("--sde_mode", default="ve")
    p.add_argument("--num_points", type=int, default=1024)
    p.add_argument("--epoch", type=int, default=None,
                   help="epoch tag for the output (default: from the clock)")
    args = p.parse_args(argv)

    from genpose_tpu.config import Config
    from genpose_tpu.utils.torch_port import port_checkpoint_file

    cfg = Config(
        posenet_mode=args.posenet_mode, pts_encoder=args.pts_encoder,
        regression_head=args.regression_head, pose_mode=args.pose_mode,
        sde_mode=args.sde_mode, num_points=args.num_points,
    )
    path = port_checkpoint_file(args.input, args.output, cfg,
                                posenet_mode=args.posenet_mode,
                                epoch=args.epoch)
    print(f"ported {args.input} -> {path}")
    return path


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
