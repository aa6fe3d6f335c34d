"""The jitted train step (reference hot loop: run.py:188-212).

One fused XLA program per step: loss (incl. device-side prior draws),
backward, clip, AdamW update. Under a data mesh the batch arrives
sharded on axis 0 and parameters replicated; because the step is written
with global-batch semantics, XLA inserts the gradient all-reduce (and
the latent all-gather the O(B^2) MMD term needs) over ICI automatically.

RNG: the per-step keys are folded out of the state's root key and the
step counter, so training is exactly reproducible from (seed, step) —
including after a checkpoint resume — and identical regardless of mesh
shape (keys are derived from globals, not per-device state).
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import jax.random as jr
import optax

from infodiffusion_tpu.train.state import TrainState


def _dropout_key(k: jax.Array) -> jax.Array:
    """Dropout keys use the hardware RngBitGenerator ('rbg') impl:
    threefry mask generation alone cost 35% of the flagship train step
    on v5e (733.7 -> 1071 imgs/s with rbg; no-dropout ceiling 1130).
    The key is derived deterministically from the train state's threefry
    key, so training stays exactly reproducible from (seed, step); only
    the mask BITS differ from the threefry stream, which carries no
    semantics. Noise/reparam/prior draws stay threefry (partitionable,
    mesh-layout-invariant). INFODIFF_THREEFRY_DROPOUT=1 reverts."""
    if os.environ.get("INFODIFF_THREEFRY_DROPOUT"):
        return k
    data = jr.key_data(k).astype(jnp.uint32)
    return jr.wrap_key_data(jnp.tile(data, 2), impl="rbg")


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    donate: bool = True,
    ema_decay: float = 0.0,
) -> Callable:
    """Returns jitted ``step_fn(state, batch, curr_epoch) -> (state, metrics)``.

    ``curr_epoch`` feeds the KLD capacity annealing
    (reference: models.py:666-668) and is a traced scalar so epoch
    rollover does not recompile.
    """
    loss_method = type(model).loss_fn

    def step_fn(state: TrainState, batch, curr_epoch):
        k = jr.fold_in(state.rng, state.step)
        k_noise, k_rep, k_drop = jr.split(k, 3)
        rngs = {
            "noise": k_noise, "reparam": k_rep,
            "dropout": _dropout_key(k_drop),
        }

        def loss_fn(params):
            loss, aux = model.apply(
                {"params": params}, batch, curr_epoch,
                method=loss_method, rngs=rngs, deterministic=False,
            )
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = state.ema_params
        if ema_decay > 0.0 and ema_params is not None:
            d = ema_decay
            ema_params = jax.tree.map(
                lambda e, p: e * d + p * (1.0 - d), ema_params, params
            )
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state,
            ema_params=ema_params,
        )
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        metrics.update(aux)
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums)


def make_eval_encode_step(model, pick_mu: bool = False) -> Callable:
    """Jitted deterministic encoder pass used by the eval modes
    (save_latent / plot_latent / disentangle / interpolate; reference:
    run.py:386-392,415-443). ``pick_mu`` applies the regularizer table
    (kld!=0 -> mu, else -> a; run.py:429-438) INSIDE the jit so only the
    chosen latent crosses the device boundary. Params are an argument,
    not a closure constant (CLAUDE.md benchmark trap 1).

    ``quant``: an optional calibrated 'quant' collection
    (ops/quant.py calibrate_encoder) — its presence switches the conv
    tier to int8 (the --turbo encode path); passing None keeps the bf16
    trace. The two call structures jit-cache separately by pytree
    structure, exactly like the samplers."""

    def encode(params, x, quant=None):
        vs = {"params": params}
        if quant is not None:
            vs["quant"] = quant
        a, _aq, mu, _lv = model.apply(
            vs, x, method=type(model).encode, sample=False
        )
        return mu if pick_mu else a

    return jax.jit(encode)
