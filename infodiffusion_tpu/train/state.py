"""Train state, optimizer and LR schedule.

Optimizer parity (reference: run.py:177-185,199): AdamW(lr=1e-4,
weight_decay=1e-5), global-norm grad clip 1.0, and the
GradualWarmupScheduler(multiplier=2, warm_epoch=1) wrapping
CosineAnnealingLR(T_max=epochs, eta_min=0).

The reference steps its scheduler once per *epoch*; its effective
per-epoch LR sequence (traced through torch _LRScheduler semantics,
reference: utils.py:133-160) is::

    epoch 0          : base
    epoch 1          : 2 * base          (warmup factor (m-1)*1/1 + 1)
    epoch e >= 2     : 2 * base * (1 + cos(pi * (e-2) / epochs)) / 2

(the cosine's internal counter starts at 0 the epoch after warmup
finishes). We reproduce exactly that staircase as an Optax schedule on
the global step, given steps_per_epoch.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    """Minimal train state: everything needed to resume exactly —
    params, optimizer state, step counter and the root RNG key. (The
    reference checkpoints weights only and cannot resume;
    run.py:145-158. Full-state checkpointing is a new capability.)

    ``ema_params`` (optional) holds an exponential moving average of the
    params — standard diffusion-training practice the reference lacks;
    enabled with --ema_decay and preferred by eval when present."""

    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array
    ema_params: Any = None

    def replace_step(self, **kw):
        return self.replace(**kw)


def warmup_cosine_schedule(
    base_lr: float, epochs: int, steps_per_epoch: int, multiplier: float = 2.0
) -> Callable:
    """The reference's epoch-level LR staircase as a step schedule."""

    def schedule(step):
        epoch = step // steps_per_epoch
        warm = base_lr * ((multiplier - 1.0) * epoch + 1.0)  # epochs 0, 1
        t = jnp.maximum(epoch - 2, 0)
        cosine = (
            multiplier
            * base_lr
            * 0.5
            * (1.0 + jnp.cos(jnp.pi * t / epochs))
        )
        return jnp.where(epoch <= 1, warm, cosine)

    return schedule


def make_optimizer(
    learning_rate: float,
    epochs: int,
    steps_per_epoch: int,
    weight_decay: float = 1e-5,
    clip_norm: float = 1.0,
) -> optax.GradientTransformation:
    """clip(1.0) -> AdamW(warmup-cosine, wd=1e-5)
    (reference: run.py:177,199,182-185)."""
    sched = warmup_cosine_schedule(learning_rate, epochs, steps_per_epoch)
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(learning_rate=sched, weight_decay=weight_decay),
    )


def create_train_state(
    model, rng: jax.Array, example_batch, tx: optax.GradientTransformation,
    ema: bool = False,
) -> TrainState:
    """Initialize params via the model's loss path (so every submodule —
    encoder, backbone, FiLM projections — is materialized)."""
    k_params, k_noise, k_rep, k_drop, k_state = jax.random.split(rng, 5)

    # jit the init: eager flax init dispatches thousands of tiny host ops
    # (~50s for even a small UNet on CPU); compiled it is one program.
    @jax.jit
    def _init():
        return model.init(
            {
                "params": k_params,
                "noise": k_noise,
                "reparam": k_rep,
                "dropout": k_drop,
            },
            example_batch,
            0,
            method=type(model).loss_fn,
        )

    variables = _init()
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=k_state,
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
    )
