"""Functional training state: params + optimizer + EMA in one pytree.

Replaces the reference's imperative optimizer/scheduler/EMA plumbing:

- optax ``chain(clip_by_global_norm, adam)`` replaces Adam + manual grad clip
  (``posenet_agent.py:92-114, 530-540``);
- the LR schedule reproduces linear warmup over ``warmup`` steps then
  per-EPOCH exponential decay gamma frozen below the 1e-4 floor
  (``posenet_agent.py:543-550``, stepped once per epoch at
  ``trainer.py:303``);
- EMA shadow params with the classic warmup decay
  ``min(decay, (1+n)/(10+n))`` (``score_utils.py:25-45``).  Unlike the
  reference (which silently does NOT checkpoint the EMA shadow,
  ``posenet_agent.py:117-141``), the shadow lives in the state pytree and is
  checkpointed with everything else.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


def make_lr_schedule(
    base_lr: float,
    warmup_steps: int,
    decay_per_epoch: float,
    steps_per_epoch: int,
    floor_lr: float = 1e-4,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """lr(step) = base * min(step/warmup, 1) * gamma^min(epoch, floor_epochs)."""
    import math

    assert 0.0 < decay_per_epoch <= 1.0, (
        f"decay_per_epoch must be in (0, 1], got {decay_per_epoch}")
    if decay_per_epoch == 1.0:  # decay disabled (log(1)=0 would divide by 0)
        floor_epochs = 0
    else:
        floor_epochs = max(0, math.ceil(math.log(floor_lr / base_lr) /
                                        math.log(decay_per_epoch)))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.minimum(step / max(warmup_steps, 1), 1.0)
        epoch = jnp.floor(step / steps_per_epoch)
        n_decay = jnp.minimum(epoch, float(floor_epochs))
        return base_lr * warm * decay_per_epoch**n_decay

    return schedule


class EMA(struct.PyTreeNode):
    """Shadow-parameter EMA (ref ``score_utils.py:3-92``)."""

    decay: float = struct.field(pytree_node=False)
    num_updates: jnp.ndarray = struct.field(default=None)
    shadow: Any = struct.field(default=None)

    @classmethod
    def create(cls, params, decay: float) -> "EMA":
        return cls(decay=decay, num_updates=jnp.zeros((), jnp.int32),
                   shadow=jax.tree_util.tree_map(jnp.copy, params))

    def update(self, params) -> "EMA":
        n = self.num_updates + 1
        decay = jnp.minimum(self.decay, (1.0 + n) / (10.0 + n))
        new_shadow = jax.tree_util.tree_map(
            lambda s, p: s - (1.0 - decay) * (s - p), self.shadow, params
        )
        return self.replace(num_updates=n, shadow=new_shadow)


class TrainState(struct.PyTreeNode):
    """Everything a train step needs, as one pytree (pjit-shardable)."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: EMA
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=self.batch_stats if new_batch_stats is None else new_batch_stats,
            opt_state=new_opt_state,
            ema=self.ema.update(new_params),
        )

    @property
    def ema_variables(self):
        return {"params": self.ema.shadow, "batch_stats": self.batch_stats}

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def create_train_state(
    variables,
    base_lr: float = 1e-3,
    warmup_steps: int = 100,
    decay_per_epoch: float = 0.98,
    steps_per_epoch: int = 1000,
    floor_lr: float = 1e-4,
    grad_clip: float = 1.0,
    ema_rate: float = 0.999,
    optimizer: str = "Adam",
    lr_schedule: Optional[Callable] = None,
) -> TrainState:
    """Build a TrainState with the reference's optimization recipe
    (``configs/config.py:50-62``, ``scripts/train_score.sh``)."""
    schedule = lr_schedule or make_lr_schedule(
        base_lr, warmup_steps, decay_per_epoch, steps_per_epoch, floor_lr
    )
    if optimizer == "Adam":
        opt = optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8)
    elif optimizer == "SGD":
        # weight decay must skip the frozen GaussianFourier W: its gradient
        # is stop_gradient'ed to zero, but add_decayed_weights would still
        # shrink it every step (torch's requires_grad=False gets no update)
        def decay_mask(params):
            def mask_fn(path, _):
                return not any(getattr(k, "key", None) == "t_fourier"
                               for k in path)
            return jax.tree_util.tree_map_with_path(mask_fn, params)

        opt = optax.chain(
            optax.masked(optax.add_decayed_weights(1e-4), decay_mask),
            optax.sgd(schedule, momentum=0.9),
        )
    else:
        raise NotImplementedError(optimizer)
    tx = optax.chain(optax.clip_by_global_norm(grad_clip), opt) \
        if grad_clip and grad_clip > 0 else opt

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema=EMA.create(params, ema_rate),
        tx=tx,
    )
