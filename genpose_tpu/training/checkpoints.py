"""Checkpoint save/restore via orbax.

Replaces the reference's ``torch.save``/``load`` (``posenet_agent.py:117-173``)
with orbax ``StandardCheckpointer`` over the TrainState pytree.  Improvements
over the reference:

- the EMA shadow IS checkpointed (the reference silently drops it and
  restores live weights as the shadow on resume, ``posenet_agent.py:125-140``);
- checkpoints are written atomically and restores are sharding-aware: orbax
  restores every array with the TEMPLATE state's sharding, so a state built
  under a mesh (``PoseAgent(..., mesh=mesh)`` replicates at construction)
  stays mesh-replicated after restore and the compiled sharded train step is
  reused without recompiling — regardless of the topology the checkpoint was
  saved from.  The flip side: restore does NOT resurrect a saved mesh
  placement into an unmeshed template.  Both directions are pinned by
  ``tests/test_checkpoint.py::test_restore_preserves_mesh_sharding`` /
  ``test_restore_into_unmeshed_template_stays_single_device``.

Layout mirrors the reference: ``<dir>/ckpt_epoch{N}`` + a ``clock.json``.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from genpose_tpu.training.state import TrainState


def _state_tree(state: TrainState):
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "ema_num_updates": state.ema.num_updates,
        "ema_shadow": state.ema.shadow,
    }


def save_checkpoint(ckpt_dir: str, state: TrainState, epoch: int,
                    clock: Optional[dict] = None) -> str:
    """Save ``ckpt_epoch{epoch}`` under ckpt_dir (ref ``save_ckpt``)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(ckpt_dir, f"ckpt_epoch{epoch}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _state_tree(state), force=True)
    ckptr.wait_until_finished()
    if clock is not None:
        with open(os.path.join(ckpt_dir, "clock.json"), "w") as f:
            json.dump(clock, f)
    return path


def load_checkpoint(path: str, state: TrainState,
                    load_model_only: bool = False) -> TrainState:
    """Restore a TrainState from ``path`` (ref ``load_ckpt``).

    ``load_model_only`` restores params/EMA/batch_stats but keeps the fresh
    optimizer state (eval / fine-tune, ref ``posenet_agent.py:170-173``).
    """
    ckptr = ocp.StandardCheckpointer()
    template = jax.tree_util.tree_map(lambda x: x, _state_tree(state))
    restored = ckptr.restore(os.path.abspath(path), template)
    new_ema = state.ema.replace(
        num_updates=restored["ema_num_updates"], shadow=restored["ema_shadow"]
    )
    if load_model_only:
        return state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            ema=new_ema,
        )
    return state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        ema=new_ema,
    )


def load_clock(ckpt_dir: str) -> Optional[dict]:
    p = os.path.join(ckpt_dir, "clock.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Path of the highest-epoch ``ckpt_epoch{N}`` in ckpt_dir."""
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_n = None, -1
    for name in os.listdir(ckpt_dir):
        if name.startswith("ckpt_epoch"):
            try:
                n = int(name[len("ckpt_epoch"):])
            except ValueError:
                continue
            if n > best_n:
                best, best_n = os.path.join(ckpt_dir, name), n
    return best
