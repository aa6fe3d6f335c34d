"""Single-head full self-attention over image tokens.

The reference computes ``softmax(q k^T / sqrt(C)) v`` over H*W tokens
with single-head 1x1-conv projections (reference: modules.py:145-164).
Token counts at the attn level are small for reference-scale inputs
(256 at 64px, where the XLA einsum is already near-roofline and is the
measured default), but grow quadratically with resolution: at the
beyond-reference 256px datapoint N=4096 and XLA materializes the
[B, N, N] f32 logits to HBM. Large-N calls therefore route through the
flash-style q-tiled kernel (ops/pallas/flash_attention.py) on TPU when
N >= INFODIFF_FLASH_ATTN_MIN_TOKENS; see that module for the gate and
measurement.

Softmax/logit math runs in f32 even when activations are bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _use_pallas() -> bool:
    # Measured on v5e (round 1): XLA's own fusions beat the first-cut
    # per-batch-element Pallas kernels on the flagship bench (68.8 vs
    # 51.3 DDIM-100 samples/s), so the XLA path is the default and the
    # kernels are opt-in until they win (shared gate: ops/gating.py).
    from infodiffusion_tpu.ops.gating import pallas_enabled

    return pallas_enabled()


def _attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    C = q.shape[-1]
    logits = jnp.einsum(
        "bnc,bmc->bnm", q, k, preferred_element_type=jnp.float32
    ) * (C ** -0.5)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bnm,bmc->bnc", w.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(v.dtype)


def single_head_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """q, k, v: [B, N, C] -> [B, N, C] (reference: modules.py:152-160).

    When a sequence-parallel context is configured (CLI --sp /
    parallel.sp.sp_scope) and the token count reaches the threshold,
    the computation runs as ring attention with tokens sharded over the
    'seq' mesh axis (parallel/ring_attention.py) — numerically the same
    softmax(q k^T / sqrt(C)) v up to f32 reassociation."""
    from infodiffusion_tpu.parallel import sp

    route = sp.sp_route(q.shape[1])
    if route is not None:
        from infodiffusion_tpu.parallel.ring_attention import ring_attention

        mesh, axis = route
        return ring_attention(q, k, v, mesh=mesh, axis=axis)
    from infodiffusion_tpu.ops.pallas.flash_attention import flash_enabled

    if flash_enabled(q.shape[1]):
        from infodiffusion_tpu.ops.pallas.flash_attention import (
            flash_attention,
        )

        try:
            return flash_attention(q, k, v)
        except NotImplementedError:
            pass
    if _use_pallas():
        from infodiffusion_tpu.ops.pallas.attention import attention_pallas

        try:
            return attention_pallas(q, k, v)
        except NotImplementedError:
            pass
    return _attention_xla(q, k, v)
