"""Flash-style single-head attention for LARGE token counts.

Covers the reference AttnBlock's ``softmax(q k^T / sqrt(C)) v``
(reference: modules.py:145-164) at the token counts where the dense XLA
einsum path becomes memory-bound: beyond ~1-2k tokens the [B, N, N] f32
logits no longer live in any fusion and XLA materializes them to HBM
twice (logits write + softmax-weight read by the second matmul) — at
the beyond-reference 256px datapoint (N=4096, b32) that is ~4.3 GB of
logits traffic per forward vs ~13 MB of q/k/v, and the 256px trace
attributes the bulk of attention time to exactly those fusions.

Shape strategy (differs from the round-1 whole-[N,N] kernel in
ops/pallas/attention.py, which requires the full logits square to fit
in VMEM and therefore caps at N≈1.5k): one grid step owns a [BQ, C]
query tile; the WHOLE [N, C] k and v ride in VMEM (C=128 at every
reference attention site, so k+v are ~1-4 MB up to N=16k — two orders
below the [N,N] square), and the [BQ, N] logits strip lives only in
registers/VMEM scratch of that step. Softmax is computed on the full
row strip — no online-rescaling pass is needed because the row is
complete inside the step, which keeps the kernel a straight-line
matmul -> softmax -> matmul at f32 statistics precision, numerically
identical to the XLA path up to reassociation. The k/v BlockSpec index
map depends only on the batch coordinate, so Mosaic's revolving-buffer
pipeline fetches k/v ONCE per batch element and streams q tiles across
the inner grid dimension.

HBM traffic per batch element drops from O(N^2) (logits out + weights
back in) to O(N*C + N^2/BQ * 0) = the q/k/v/o tensors themselves; the
[BQ, N] strip never leaves the core.

MEASURED (v5e via tunnel, tools/flash_attn_bench.py: bf16, C=128,
per-invocation medians with per-rep-varied inputs, value-fetch sync,
"significant" = medians differ by more than the summed middle-half
spreads):

    N     B    XLA ms   flash ms   speedup   significant
    256   128   0.089     0.181      0.49x    yes  (XLA wins)
    512   128   0.639     0.419      1.52x    yes
    1024  128   2.290     1.242      1.84x    yes
    2048   64   6.991     4.697      1.49x    no (spreads overlap)
    4096   32  21.323     7.026      3.04x    yes

The crossover sits between 256 and 512 tokens: below it the whole
logits square fits the fusion budget and XLA's einsum is ahead (the
round-1 finding — the 64px flagship's N=256 sites stay on XLA); from
512 up the kernel wins, growing with N exactly as the HBM-traffic
model predicts. Default-ON on TPU for N >=
INFODIFF_FLASH_ATTN_MIN_TOKENS (default 512, the measured crossover);
max |diff| vs the XLA path is one bf16 ulp at every config.
INFODIFF_DISABLE_FLASH_ATTENTION=1 force-reverts to XLA everywhere.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# the [BQ, N] f32 logits strip is the dominant VMEM tenant; cap it so
# strip + k + v + q/o tiles stay well inside ~16 MB/core
_LOGITS_BUDGET = 4 * 1024 * 1024
# k and v ride whole; bound their combined VMEM footprint
_KV_BUDGET = 8 * 1024 * 1024


def flash_min_tokens() -> int:
    return int(os.environ.get("INFODIFF_FLASH_ATTN_MIN_TOKENS", "512"))


def flash_enabled(n_tokens: int) -> bool:
    """TPU routing gate for large-N attention; the dense XLA path
    stays the default below the threshold (where it measured faster in
    round 1). Threshold and default set by the round-4 measurement
    recorded in STATUS.md. INFODIFF_DISABLE_FLASH_ATTENTION=1 reverts
    everywhere."""
    if os.environ.get("INFODIFF_DISABLE_FLASH_ATTENTION") == "1":
        return False
    if n_tokens < flash_min_tokens():
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _pick_block_q(n: int, c: int) -> int:
    """Largest power-of-two q tile with a [BQ, N] f32 strip under
    budget; 8 (the f32 sublane) is the floor, 512 the practical cap
    (beyond it the strip crowds out k/v double buffering)."""
    bq = 512
    while bq > 8 and (bq * n * 4 > _LOGITS_BUDGET or n % bq != 0):
        bq //= 2
    return bq


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    # MXU matmul in the input dtype (bf16 on the policy path) with f32
    # accumulation; softmax statistics stay f32 (framework convention)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    w = p / jnp.sum(p, axis=-1, keepdims=True)
    # match the XLA path bit-for-bit where it matters: weights are cast
    # to v.dtype before the second matmul (ops/attention.py)
    out = jnp.dot(
        w.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    block_q: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """q, k, v: [B, N, C] -> [B, N, C]; raises NotImplementedError for
    shapes outside the kernel's envelope (caller falls back to XLA)."""
    B, N, C = q.shape
    itemsize = jnp.dtype(q.dtype).itemsize
    if 2 * N * C * itemsize > _KV_BUDGET:
        raise NotImplementedError("k/v exceed the whole-tensor VMEM plan")
    bq = block_q or _pick_block_q(N, C)
    if N % bq != 0:
        raise NotImplementedError("token count not divisible by q tile")
    scale = float(C) ** -0.5
    q_spec = pl.BlockSpec(
        (1, bq, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, N, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(B, N // bq),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, C), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * N * N * C,
            bytes_accessed=4 * B * N * C * itemsize,
            transcendentals=B * N * N,
        ),
        interpret=interpret,
    )(q, k, v)
