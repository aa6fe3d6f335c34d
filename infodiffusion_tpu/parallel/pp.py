"""Pipeline parallelism: a GPipe microbatch executor over a mesh axis.

SURVEY.md §2.3: the reference has no parallelism of any kind, and at
this model scale (35M-param UNets) pipeline parallelism is never the
binding constraint — so PP is NOT wired into the CLI. It exists here as
a first-class, tested capability of the parallel toolbox for scales
beyond the reference's: a generic ring-pipeline executor built the TPU
way (one jitted program; `shard_map` over a ``stage`` mesh axis;
activations move between stages with `lax.ppermute` over ICI; the
microbatch schedule is a `lax.scan`, not host control flow).

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

from typing import Any, Callable

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
    """
    S = int(mesh.shape[axis])
    M = h0.shape[0]

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
        in_specs=(P(axis), P(), P()),
        out_specs=P(),
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


def _mid_layer(pl, h, x, cond, dtype):
    """One middle MLPLNAct layer, functionally (must match
    nn/blocks.py:MLPLNAct with norm=True, use_cond=True,
    activation='silu', condition_bias=1.0; dropout is a no-op in the
    deterministic eval path this demo covers)."""
    hin = jnp.concatenate([h, x], axis=-1).astype(dtype)
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
    return jax.nn.silu(yf.astype(dtype))


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
        assert L % n_stages == 0, (L, n_stages)
        return leaf.reshape((n_stages, L // n_stages) + leaf.shape[1:])

    return jax.tree.map(r, stacked)
