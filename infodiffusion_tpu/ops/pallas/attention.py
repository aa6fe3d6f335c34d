"""Fused single-head attention Pallas kernel.

Covers the reference AttnBlock's softmax(q k^T / sqrt(C)) v
(reference: modules.py:145-164). Token counts N = H*W at the attention
level are small (16..4096), so one (batch,) grid step holds the whole
[N, C] q/k/v tiles plus the [N, N] logits in VMEM and fuses matmul ->
softmax -> matmul with no HBM round-trip for the logits.

Falls back (NotImplementedError -> caller uses XLA) for shapes that
don't fit the single-block budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# [N,C] q/k/v + [N,N] logits, all f32, must fit comfortably in ~16MB VMEM.
_VMEM_BUDGET = 12 * 1024 * 1024


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    w = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.dot(w, v, preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def attention_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    B, N, C = q.shape
    itemsize = 4
    need = (3 * N * C + N * N + N * C) * itemsize
    if need > _VMEM_BUDGET:
        raise NotImplementedError("attention tile exceeds VMEM budget")
    scale = float(C) ** -0.5
    spec = pl.BlockSpec((1, N, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, N, C), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * N * N * C,
            bytes_accessed=4 * B * N * C * itemsize,
            transcendentals=B * N * N,
        ),
    )(q, k, v)
