"""Pipeline parallelism: a GPipe microbatch executor over a mesh axis.

SURVEY.md §2.3: the reference has no parallelism of any kind; PP exists
here as a first-class capability of the parallel toolbox for scales
beyond the reference's, CLI-wired as ``--pp N`` for train_latent_ddim
(runner.py). It is a generic ring-pipeline executor built the TPU way
(one jitted program; `shard_map` over a ``stage`` mesh axis;
activations move between stages with `lax.ppermute` over ICI; the
microbatch schedule is a `lax.scan`, not host control flow). It
composes with data parallelism over a ('data', 'stage') 2-D mesh
(make_dp_stage_mesh): each data row is an independent pipeline replica,
and the runner builds that mesh automatically when more devices than
stages are available.

Demonstrated and equivalence-tested (forward AND gradients) on the
latent denoiser's homogeneous middle stack (LatentUNet layers 1..8 —
models/latent_unet.py), which partitions cleanly: every middle layer
maps concat([h, x]) with the same parameter structure. The image UNet
is deliberately not partitioned: its skip connections couple down and
up stages and its levels are heterogeneous — and nothing at reference
scale needs it (STATUS.md: train step uses 5.6 GiB of 16 GiB at b128).

Scheduling: classic GPipe fill-drain. With S stages and M microbatches,
the scan runs M + S - 1 ticks; at tick t, stage s computes microbatch
t - s (a bubble otherwise — the compute still runs on garbage and is
masked out, keeping the program SPMD). Outputs are collected on the
last stage and `psum` over the stage axis replicates them (every other
stage contributes zeros).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # newer jax exposes it at top level
    from jax import shard_map as _shard_map  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

# the replication-check kwarg was renamed check_rep -> check_vma; detect
# which one THIS jax takes rather than keying off the import location
import inspect

_CHECK_KW = (
    "check_vma"
    if "check_vma" in inspect.signature(_shard_map).parameters
    else "check_rep"
)


def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
    return _shard_map(
        f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        **{_CHECK_KW: check_rep},
    )


STAGE_AXIS = "stage"


def make_stage_mesh(n_stages: int, devices=None) -> Mesh:
    from infodiffusion_tpu.parallel.mesh import make_1d_mesh

    return make_1d_mesh(n_stages, STAGE_AXIS, devices)


def make_dp_stage_mesh(n_data: int, n_stages: int, devices=None) -> Mesh:
    """('data', 'stage') 2-D mesh: ``n_data`` data-parallel pipeline
    replicas of ``n_stages`` stages each. Stages of one replica are
    adjacent devices (the ppermute ring rides ICI neighbors); the data
    axis is the slow one, exactly like the train mesh
    (parallel/mesh.py)."""
    import numpy as np

    from infodiffusion_tpu.parallel.mesh import DATA_AXIS

    n = n_data * n_stages
    devices = devices if devices is not None else jax.devices()[:n]
    if len(devices) != n:
        raise ValueError(
            f"dp x pp mesh wants {n} devices ({n_data} x {n_stages}) but "
            f"only {len(devices)} are available"
        )
    arr = np.asarray(devices).reshape(n_data, n_stages)
    return Mesh(arr, (DATA_AXIS, STAGE_AXIS))


def gpipe(
    stage_fn: Callable[[Any, jnp.ndarray, Any], jnp.ndarray],
    stage_params: Any,
    h0: jnp.ndarray,
    aux: Any,
    *,
    mesh: Mesh,
    axis: str = STAGE_AXIS,
):
    """Run microbatched activations through S pipeline stages.

    stage_fn(params_s, h, aux_mb) -> h'   (shape/dtype-preserving)
    stage_params: pytree with a leading stage axis on every leaf
        ([S, ...]); stage s applies slice s.
    h0:  [M, mb, D] microbatched activations entering stage 0.
    aux: pytree of [M, mb, ...] arrays riding along with each
        microbatch (e.g. the latent skip input and the conditioning).

    Returns [M, mb, D]: the last stage's outputs, replicated.
    Differentiable end-to-end (ppermute/psum have transpose rules), so
    the same executor serves pipelined training.

    When the mesh also has a ``data`` axis (make_dp_stage_mesh), the
    microbatch dim (mb) of h0/aux/output is sharded over it: each data
    row runs an independent pipeline replica on its batch slice (the
    ppermute ring and the output psum act per-replica over 'stage'
    automatically — named collectives subgroup over the other mesh
    axes), and the caller's loss mean/gradients reduce over 'data'
    through ordinary GSPMD. That is the dp x pp composition.
    """
    S = int(mesh.shape[axis])
    M = h0.shape[0]
    from infodiffusion_tpu.parallel.mesh import DATA_AXIS

    dp = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
    mb_spec = P(None, dp) if dp else P()

    def body(p, h0, aux):
        s = lax.axis_index(axis)
        p_local = jax.tree.map(lambda l: l[0], p)  # this stage's slice

        def tick(carry, t):
            hbuf, out = carry
            idx = jnp.clip(t - s, 0, M - 1)
            h_in = jnp.where(s == 0, h0[idx], hbuf)
            aux_mb = jax.tree.map(lambda a_: a_[idx], aux)
            h_out = stage_fn(p_local, h_in, aux_mb)
            write = ((t - s) >= 0) & ((t - s) < M) & (s == S - 1)
            upd = jnp.where(write, h_out, out[idx])
            out = lax.dynamic_update_index_in_dim(out, upd, idx, 0)
            # ring-shift activations to the next stage (ICI neighbor)
            hnext = lax.ppermute(
                h_out, axis, [(i, (i + 1) % S) for i in range(S)]
            )
            return (hnext, out), None

        hbuf0 = jnp.zeros(h0.shape[1:], h0.dtype)
        out0 = jnp.zeros(h0.shape, h0.dtype)
        (_, out), _ = lax.scan(tick, (hbuf0, out0), jnp.arange(M + S - 1))
        # only the last stage wrote non-zeros
        return lax.psum(out, axis)

    return shard_map(
        body, mesh,
        in_specs=(P(axis), mb_spec, mb_spec),
        out_specs=mb_spec,
        check_rep=False,
    )(stage_params, h0, aux)


# ---------------------------------------------------------------------------
# LatentUNet middle-stack demonstration (models/latent_unet.py layers 1..8)
# ---------------------------------------------------------------------------


def stack_latent_middle(params: Any, lo: int = 1, hi: int = 9) -> Any:
    """Stack LatentUNet layer_{lo}..layer_{hi-1} params into one pytree
    with leading layer axis (all middle layers share a structure)."""
    layers = [params[f"layer_{i}"] for i in range(lo, hi)]
    return jax.tree.map(lambda *ls: jnp.stack(ls), *layers)


def _mlpln_layer(pl, hin, cond, dtype, mask=None):
    """One conditioned MLPLNAct, functionally, on a pre-assembled input
    (must match nn/blocks.py:MLPLNAct with norm=True, use_cond=True,
    activation='silu', condition_bias=1.0). ``mask`` is an optional
    precomputed inverted-dropout mask (bernoulli/keep_prob) applied
    after the activation, exactly where flax's nn.Dropout sits."""
    y = hin @ pl["linear"]["kernel"].astype(dtype) + pl["linear"]["bias"].astype(dtype)
    c = (
        jax.nn.silu(cond).astype(dtype) @ pl["linear_emb"]["kernel"].astype(dtype)
        + pl["linear_emb"]["bias"].astype(dtype)
    )
    y = y * (1.0 + c)
    yf = y.astype(jnp.float32)
    mu = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(yf), axis=-1, keepdims=True) - jnp.square(mu)
    yf = (yf - mu) * lax.rsqrt(var + 1e-5)
    yf = yf * pl["norm"]["scale"] + pl["norm"]["bias"]
    y = jax.nn.silu(yf.astype(dtype))
    if mask is not None:
        y = y * mask.astype(dtype)
    return y


def _mid_layer(pl, h, x, cond, dtype, mask=None):
    """One middle LatentUNet layer: input skip-concat then MLPLNAct
    (models/latent_unet.py; reference: models.py:229-233)."""
    hin = jnp.concatenate([h, x], axis=-1).astype(dtype)
    return _mlpln_layer(pl, hin, cond, dtype, mask)


def latent_mid_stage_fn(layers_per_stage: int, dtype=jnp.float32):
    """stage_fn applying `layers_per_stage` consecutive middle layers;
    stage params carry a leading per-stage layer axis
    ([layers_per_stage, ...] leaves)."""

    def stage_fn(p, h, aux):
        x, cond = aux

        def one(h_, pl):
            return _mid_layer(pl, h_, x, cond, dtype), None

        h, _ = lax.scan(one, h, p)
        return h

    return stage_fn


def latent_middle_sequential(stacked, h, x, cond, dtype=jnp.float32):
    """Reference path: the same functional middle layers, sequentially
    (leading axis = all 8 layers) — the oracle for gpipe equivalence."""

    def one(h_, pl):
        return _mid_layer(pl, h_, x, cond, dtype), None

    h, _ = lax.scan(one, h, stacked)
    return h


def reshape_for_stages(stacked: Any, n_stages: int) -> Any:
    """[L, ...] layer-stacked params -> [S, L/S, ...] stage-major."""

    def r(leaf):
        L = leaf.shape[0]
        if L % n_stages:
            raise ValueError(
                f"{L} stacked layers do not split over {n_stages} stages"
            )
        return leaf.reshape((n_stages, L // n_stages) + leaf.shape[1:])

    return jax.tree.map(r, stacked)


# ---------------------------------------------------------------------------
# Product path: CLI-driven pipelined latent-DDIM training (--pp N).
#
# The LatentUNet is the one reference model that partitions cleanly: its
# 8 middle layers are homogeneous (models/latent_unet.py; reference:
# models.py:166-234). `latent_pp_forward` runs the full denoiser with
# layers 1..8 executed by the GPipe ring above, and `make_pp_train_step`
# wraps it in the same loss/update step as train/step.py. Dropout is
# functional here (precomputed inverted-dropout masks riding with each
# microbatch), so training semantics match the non-pipelined step;
# deterministic=True makes the forward exactly equal to the flax module
# (guarded by test_pp + dryrun_multichip).
# ---------------------------------------------------------------------------


def latent_pp_stage_fn(layers_per_stage: int, dtype=jnp.float32,
                       with_masks: bool = False):
    """stage_fn for `latent_pp_forward`: stage params are
    {'layers': [lps, ...]-leaf pytree, 'idx': scalar stage index}; aux is
    (x_mb, cond_mb[, masks_mb]) with masks_mb [mb, L_total, D]."""

    def stage_fn(p, h, aux):
        idx = p["idx"]
        if with_masks:
            x, cond, masks = aux
        else:
            x, cond = aux
            masks = None

        def one(h_, inp):
            pl, j = inp
            m = None
            if masks is not None:
                m = lax.dynamic_index_in_dim(
                    masks, idx * layers_per_stage + j, axis=1, keepdims=False
                )
            return _mid_layer(pl, h_, x, cond, dtype, mask=m), None

        h, _ = lax.scan(one, h, (p["layers"], jnp.arange(layers_per_stage)))
        return h

    return stage_fn


def latent_pp_forward(
    bb_params: Any,
    x: jnp.ndarray,
    t: jnp.ndarray,
    *,
    mesh: Mesh,
    microbatches: int,
    axis: str = STAGE_AXIS,
    deterministic: bool = True,
    dropout_rng=None,
    dropout: Optional[float] = None,
    num_layers: Optional[int] = None,
    time_emb_ch: Optional[int] = None,
    dtype=jnp.float32,
):
    """Full LatentUNet forward ([B, d] latents) with the middle stack
    pipelined over the 'stage' mesh axis. ``bb_params`` is the
    LatentUNet param subtree (state.params['backbone']); numerics match
    models/latent_unet.py exactly when deterministic.

    dropout / num_layers / time_emb_ch default to the SAME constants the
    latent Diff wrapper builds its LatentUNet from
    (models.wrappers.LATENT_BACKBONE_KWARGS + the LatentUNet field
    default) — a single source of truth, so the pipelined replica cannot
    silently drift from the sequential architecture."""
    import jax.random as jr

    from infodiffusion_tpu.models.latent_unet import LatentUNet
    from infodiffusion_tpu.models.wrappers import LATENT_BACKBONE_KWARGS

    if dropout is None:
        dropout = LATENT_BACKBONE_KWARGS["dropout"]
    if num_layers is None:
        num_layers = LATENT_BACKBONE_KWARGS["num_layers"]
    if time_emb_ch is None:
        time_emb_ch = LatentUNet.num_time_emb_channels

    from infodiffusion_tpu.nn.embeddings import timestep_embedding

    B, d = x.shape
    S = int(mesh.shape[axis])
    M = int(microbatches)
    if M < 1:
        raise ValueError(
            f"--pp microbatch count must be >= 1, got {M} "
            "(INFODIFF_PP_MICROBATCHES)"
        )
    if B % M:
        raise ValueError(
            f"batch size {B} must be divisible by the microbatch count {M} "
            f"(--pp pipelining)"
        )
    L = num_layers - 2  # homogeneous middle layers
    if L % S:
        raise ValueError(
            f"{L} middle layers do not split over {S} pipeline stages"
        )
    lps = L // S
    from infodiffusion_tpu.parallel.mesh import DATA_AXIS

    if DATA_AXIS in mesh.axis_names:
        dp_width = int(mesh.shape[DATA_AXIS])
        if (B // M) % dp_width:
            raise ValueError(
                f"microbatch size {B // M} must divide over the {dp_width}"
                f"-wide data axis of the dp x pp mesh (batch {B}, "
                f"{M} microbatches)"
            )

    # time embed: sinusoid -> [Dense -> SiLU]*(n-1) -> Dense; depth read
    # from LatentUNet.num_time_layers like the channel count above, so
    # a derivative changing it cannot silently diverge from this replica
    n_time = LatentUNet.num_time_layers
    temb = timestep_embedding(t, time_emb_ch).astype(dtype)
    for i in range(n_time):
        w = bb_params[f"time_embed_{i}"]
        temb = temb @ w["kernel"].astype(dtype) + w["bias"].astype(dtype)
        if i < n_time - 1:
            temb = jax.nn.silu(temb)

    use_masks = (not deterministic) and dropout > 0.0
    mask0 = masks = None
    if use_masks:
        assert dropout_rng is not None, "dropout requires dropout_rng"
        kp = 1.0 - dropout
        k0, km = jr.split(dropout_rng)
        D = 4 * d
        mask0 = jr.bernoulli(k0, kp, (B, D)).astype(jnp.float32) / kp
        masks = jr.bernoulli(km, kp, (B, L, D)).astype(jnp.float32) / kp

    # layer 0: MLPLNAct on x alone (no skip concat yet)
    h = _mlpln_layer(bb_params["layer_0"], x.astype(dtype), temb, dtype, mask0)

    mb = B // M
    h0 = h.reshape(M, mb, -1)
    aux = (x.reshape(M, mb, d).astype(dtype), temb.reshape(M, mb, -1))
    if use_masks:
        aux = aux + (masks.reshape(M, mb, L, -1),)

    stacked = stack_latent_middle(bb_params, 1, num_layers - 1)
    staged = reshape_for_stages(stacked, S)
    sp = {"layers": staged, "idx": jnp.arange(S)}
    out = gpipe(
        latent_pp_stage_fn(lps, dtype, with_masks=use_masks), sp, h0, aux,
        mesh=mesh, axis=axis,
    )
    h = out.reshape(B, -1)

    # final layer: skip-concat -> Dense, no norm/act/cond/dropout
    w = bb_params[f"layer_{num_layers - 1}"]["linear"]
    hin = jnp.concatenate([h, x.astype(dtype)], axis=-1)
    return hin @ w["kernel"].astype(dtype) + w["bias"].astype(dtype)


def pp_latent_loss(
    params: Any,
    x_tilde: jnp.ndarray,
    t: jnp.ndarray,
    eps: jnp.ndarray,
    *,
    mesh: Mesh,
    microbatches: int,
    deterministic: bool = True,
    dropout_rng=None,
    dtype=jnp.float32,
):
    """eps-MSE of the pipelined latent denoiser — the same loss as
    Diff.loss_fn(is_latent) on pre-noised inputs (reference:
    models.py:753-762)."""
    out = latent_pp_forward(
        params["backbone"], x_tilde, t, mesh=mesh,
        microbatches=microbatches, deterministic=deterministic,
        dropout_rng=dropout_rng, dtype=dtype,
    )
    return jnp.mean(
        jnp.square(out.astype(jnp.float32) - eps.astype(jnp.float32))
    )


def make_pp_train_step(
    model,
    tx,
    mesh: Mesh,
    microbatches: int,
    ema_decay: float = 0.0,
    deterministic_dropout_off: bool = False,
):
    """Jitted pipelined train step for the latent Diff model — the --pp
    counterpart of train/step.py:make_train_step (same optimizer wiring,
    same (seed, step)-reproducible RNG discipline; the dropout mask bits
    come from a different stream than flax's nn.Dropout, which carries no
    semantics). ``deterministic_dropout_off`` turns dropout off, making
    the step numerically comparable to a no-dropout sequential step (used
    by the dryrun equivalence check)."""
    import jax.random as jr
    import optax

    from infodiffusion_tpu.diffusion.schedule import make_schedule, q_sample
    from infodiffusion_tpu.train.step import _dropout_key

    sched = make_schedule(model.beta1, model.betaT, model.T)
    dtype = model.dtype

    def step_fn(state, batch, curr_epoch):
        del curr_epoch  # latent Diff loss has no capacity annealing
        k = jr.fold_in(state.rng, state.step)
        k_noise, k_drop = jr.split(k)
        k_t, k_eps = jr.split(k_noise)
        B = batch.shape[0]
        t = jr.randint(k_t, (B,), 0, model.T)
        eps = jr.normal(k_eps, batch.shape, batch.dtype)
        x_tilde = q_sample(sched, batch, t, eps)

        def loss_fn(params):
            return pp_latent_loss(
                params, x_tilde, t, eps, mesh=mesh,
                microbatches=microbatches,
                deterministic=deterministic_dropout_off,
                dropout_rng=_dropout_key(k_drop), dtype=dtype,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = state.ema_params
        if ema_decay > 0.0 and ema_params is not None:
            d_ = ema_decay
            ema_params = jax.tree.map(
                lambda e, p: e * d_ + p * (1.0 - d_), ema_params, params
            )
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state,
            ema_params=ema_params,
        )
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads),
                   "denoise": loss}
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))
