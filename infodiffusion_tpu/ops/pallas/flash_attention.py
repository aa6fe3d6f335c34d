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
reference attention site, so k+v in bf16 are 0.5 MB at N=1024 and
2 MB at N=4096 — an order below the [N,N] square), and the [BQ, N]
logits strip lives only in registers/VMEM scratch of that step.
Envelope (measured, round 5): because k/v vary along the OUTER batch
grid dimension, Mosaic double-buffers them, so the scoped-VMEM plan
is 2·(k+v) + strip + q/o tiles. At N=16384 that is 16.06 MB against
the 16.00 MB core limit — the 512px probe failed compile with exactly
that message — so this PRIMARY kernel tops out at N=8192 (plan
≈ 12.1 MB — hardware-verified: compiles and matches XLA to 1 bf16 ulp
at B=1 N=8192 C=128); at the beyond-reference sites actually in use
(N ≤ 4096) the plan is ≤ 8.3 MB with ample headroom. Beyond N=8192
``flash_attention`` auto-routes to the streaming online-softmax
variant further down this module (k/v tiled, VMEM-use independent of
N — it unlocked 512px sampling); multi-chip --sp ring attention also
exists for that regime. Softmax is computed on
the full row strip — no online-rescaling pass is needed because the
row is complete inside the step, which keeps the kernel a
straight-line matmul -> softmax -> matmul at f32 statistics precision,
numerically identical to the XLA path up to reassociation. The k/v
BlockSpec index map depends only on the batch coordinate, so Mosaic's
revolving-buffer pipeline fetches k/v ONCE per batch element and
streams q tiles across the inner grid dimension.

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

Autodiff (round 5, closing the round-4 VERDICT defect): the op is a
``jax.custom_vjp``. The backward is its own Pallas kernel with the
same shape strategy — per-q-tile recompute of the [BQ, N] softmax
strip from the saved q/k/v residuals (recompute-style flash VJP: the
strip is cheaper to re-form than to round-trip through HBM), then

    dp    = do @ v^T                      [BQ, N]
    delta = rowsum(w * dp)                [BQ, 1]   (softmax VJP stat)
    ds    = w * (dp - delta) * scale      [BQ, N]
    dq    = ds @ k                        [BQ, C]   (per-tile write)
    dk   += ds^T @ q                      [N, C]    (f32 accumulator)
    dv   += w^T @ do                      [N, C]    (f32 accumulator)

dk/dv are revisited output blocks (index map depends only on the batch
coordinate): zero-initialized at the first q tile and accumulated in
f32 across the inner grid dimension, cast to the input dtype outside
the kernel. The [BQ, N] strips (w, dp, ds) never leave the core, so
the backward keeps the forward's O(N*C) HBM traffic. Outside the
backward envelope (f32 dk+dv accumulators over ``_ACC_BUDGET``) the
VJP falls back to the dense XLA gradient — correct, just logits-in-HBM
at those sizes. Grad parity vs the XLA path is pinned in
tests/test_flash_attention.py (interpret f32/bf16 + TPU smoke).

MEASURED, fwd+bwd (v5e, INFODIFF_FAB_GRAD=1 tools/flash_attn_bench.py:
value+grad of a scalar through the op — flash takes this kernel, dense
takes XLA autodiff; bf16, C=128, same variance-controlled discipline
as the forward table, all rows significant):

    N     B    XLA ms   flash ms   speedup
    512   128   1.604     0.872      1.84x
    1024  128   7.480     3.995      1.87x
    4096   32  32.811    11.543      2.84x

End-to-end the backward converts too: the 128px b64 TRAIN step
measures 173.9 imgs/s with flash vs 161.8 with
INFODIFF_DISABLE_FLASH_ATTENTION=1 (+7.5%), and 256px training
(N=4096) runs at 37.3 imgs/s b16 through this backward.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# the [BQ, N] f32 logits strip is the dominant VMEM tenant; cap it so
# strip + k + v + q/o tiles stay inside ~16 MB/core (see the docstring
# for the plan arithmetic at the envelope edge)
_LOGITS_BUDGET = 4 * 1024 * 1024
# k and v ride whole — but they VARY along the outer (batch) grid
# dimension, so Mosaic's revolving-buffer pipeline allocates TWO
# buffers for each; the scoped-VMEM plan must count them twice.
# Measured (round 5, the 512px probe): N=16384 C=128 bf16 (k+v 8 MB)
# fails compile with "Scoped allocation with size 16.06M and limit
# 16.00M" — exactly 2x(k+v) + the q/o tiles. The forward plan is
# therefore 2*(k+v) + strip + tiles <= this limit (N<=8192 at the
# C=128 bf16 sites; N=4096, the 256px grid, is hardware-proven).
_FWD_PLAN_LIMIT = 15 * 1024 * 1024 + 512 * 1024
# backward: the f32 dk+dv accumulators also ride whole per batch
# element (and also double-buffer — they are revisited output windows
# that move with b); beyond this the VJP falls back to the dense XLA
# gradient. The N=4096 backward plan (2*kv 4 MB + 2*acc 8 MB + 3
# strips 3 MB ~= 15 MB by this model) is hardware-proven by the
# fwd+bwd kernel bench; N=8192 (2*acc alone = 16 MB) is not plannable.
_ACC_BUDGET = 8 * 1024 * 1024
_BWD_PLAN_LIMIT = 16 * 1024 * 1024


def flash_min_tokens() -> int:
    return int(os.environ.get("INFODIFF_FLASH_ATTN_MIN_TOKENS", "512"))


def flash_enabled(n_tokens: int) -> bool:
    """TPU routing gate for large-N attention; the dense XLA path
    stays the default below the threshold (where it measured faster in
    round 1). Threshold and default set by the round-4 measurement
    recorded in STATUS.md. Refuses when a non-trivial mesh is active
    (ops/gating.py mesh_compute_scope): a pallas_call under a
    GSPMD-sharded jit is unvalidated, so sharded sampling/training
    keeps the natively-partitioned XLA path (round-4 advisor finding).
    INFODIFF_DISABLE_FLASH_ATTENTION=1 reverts everywhere."""
    if os.environ.get("INFODIFF_DISABLE_FLASH_ATTENTION") == "1":
        return False
    if n_tokens < flash_min_tokens():
        return False
    from infodiffusion_tpu.ops.gating import active_mesh_size

    if active_mesh_size() > 1:
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


def _pick_block_q_bwd(n: int, c: int) -> int:
    """The backward holds ~3 live [BQ, N] f32 strips (w, dp, ds), so
    its q tile gets a third of the strip budget."""
    bq = 512
    while bq > 8 and (3 * bq * n * 4 > _LOGITS_BUDGET or n % bq != 0):
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


def _bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale: float
):
    i = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    # recompute the softmax strip exactly as the forward formed it
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    w = p / jnp.sum(p, axis=-1, keepdims=True)  # [BQ, N] f32
    # dp = do @ v^T, f32 accumulation on the MXU
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # softmax VJP on the complete row: ds = w * (dp - rowsum(w*dp));
    # the logits scale folds in here (logits = (q k^T) * scale)
    delta = jnp.sum(w * dp, axis=-1, keepdims=True)
    ds = (w * (dp - delta)) * scale  # [BQ, N] f32
    # MXU matmuls run in the input dtype (mirrors what XLA's own bf16
    # backward does); accumulation stays f32
    ds_c = ds.astype(q.dtype)
    w_c = w.astype(v.dtype)
    dq = jax.lax.dot_general(
        ds_c, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk_c = jax.lax.dot_general(
        ds_c, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dv_c = jax.lax.dot_general(
        w_c, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)

    # dk/dv output blocks are revisited across the inner (q-tile) grid
    # dimension: zero once, then accumulate in f32
    @pl.when(i == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    dk_ref[0] += dk_c
    dv_ref[0] += dv_c


def _check_envelope(q, bq: int) -> None:
    B, N, C = q.shape
    itemsize = jnp.dtype(q.dtype).itemsize
    kv = 2 * N * C * itemsize  # k + v, whole
    strip = bq * N * 4  # the on-core f32 logits strip
    tiles = 4 * bq * C * itemsize  # q + o tiles, double-buffered
    if 2 * kv + strip + tiles > _FWD_PLAN_LIMIT:
        raise NotImplementedError(
            "flash plan exceeds scoped VMEM (k/v double-buffer across "
            "the batch grid dim — see _FWD_PLAN_LIMIT)"
        )


def _fwd_call(q, k, v, bq: int, interpret: bool):
    B, N, C = q.shape
    itemsize = jnp.dtype(q.dtype).itemsize
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


def _bwd_call(q, k, v, do, interpret: bool, block_q: int | None = None):
    """Pallas backward; raises NotImplementedError outside the
    accumulator envelope (the caller falls back to the dense VJP).
    ``block_q`` overrides the q-tile size (tests force multi-tile
    dk/dv accumulation with it; production uses the picker)."""
    B, N, C = q.shape
    itemsize = jnp.dtype(q.dtype).itemsize
    if 2 * N * C * 4 > _ACC_BUDGET:
        raise NotImplementedError("f32 dk/dv accumulators exceed VMEM plan")
    bq = block_q or _pick_block_q_bwd(N, C)
    if N % bq != 0:
        raise NotImplementedError("token count not divisible by q tile")
    # full backward plan with the double-buffered k/v and dk/dv (see
    # the budget comments at the top of the module)
    kv = 2 * N * C * itemsize
    acc = 2 * N * C * 4
    strips = 3 * bq * N * 4
    if 2 * kv + 2 * acc + strips > _BWD_PLAN_LIMIT:
        raise NotImplementedError("flash backward plan exceeds scoped VMEM")
    scale = float(C) ** -0.5
    q_spec = pl.BlockSpec(
        (1, bq, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, N, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(B, N // bq),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec],
        out_specs=[q_spec, kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, C), q.dtype),
            jax.ShapeDtypeStruct((B, N, C), jnp.float32),
            jax.ShapeDtypeStruct((B, N, C), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 5 * B * N * N * C,
            bytes_accessed=7 * B * N * C * itemsize,
            transcendentals=B * N * N,
        ),
        interpret=interpret,
    )(q, k, v, do)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


def _dense_vjp(q, k, v, do):
    """Dense XLA gradient (same math as ops/attention._attention_xla,
    restated locally to avoid a circular import) — the fallback when
    the backward kernel's envelope is exceeded."""

    def dense(q_, k_, v_):
        C = q_.shape[-1]
        logits = jnp.einsum(
            "bnc,bmc->bnm", q_, k_, preferred_element_type=jnp.float32
        ) * (C ** -0.5)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bnm,bmc->bnc", w.astype(v_.dtype), v_,
            preferred_element_type=jnp.float32,
        )
        return out.astype(v_.dtype)

    _, vjp = jax.vjp(dense, q, k, v)
    return vjp(do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, bq: int, interpret: bool):
    return _fwd_call(q, k, v, bq, interpret)


def _flash_fwd(q, k, v, bq: int, interpret: bool):
    out = _fwd_call(q, k, v, bq, interpret)
    return out, (q, k, v)


def _flash_bwd(bq: int, interpret: bool, res, do):
    q, k, v = res
    try:
        return _bwd_call(q, k, v, do, interpret)
    except NotImplementedError:
        return _dense_vjp(q, k, v, do)


_flash.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# Online-softmax variant for N beyond the whole-k/v envelope (>8192)
# ---------------------------------------------------------------------------
#
# The classic flash-attention recurrence: k/v stream through VMEM in
# [BK, C] tiles along the innermost grid dimension while running
# (max, sum, accumulator) statistics live in VMEM scratch —
#     m'   = max(m, rowmax(s_j))
#     corr = exp(m - m')
#     l'   = l * corr + rowsum(exp(s_j - m'))
#     acc' = acc * corr + exp(s_j - m') @ v_j
# so VMEM holds only the tiles (~1-2 MB regardless of N) and the
# envelope is bounded by HBM, not the 16 MB core. This trades the
# primary kernel's single straight-line softmax for a per-tile
# rescaling pass, so it routes ONLY where the primary cannot plan
# (N > 8192): at 512px (N=16384) the dense path would need a
# [N, N] f32 logits square = 1 GB per batch element and the primary
# kernel's plan measures 16.06 MB > the 16 MB core limit, making this
# the only single-chip route to 512px-class attention. Backward: the
# same custom_vjp rules as the primary (whole-k/v backward kernel when
# it fits, dense VJP otherwise) — at N=16384 that means the dense
# gradient's HBM cost, so this variant is an inference-scale envelope,
# not a training one.
#
# MEASURED inside the overlap region (v5e, inner=24 lax.map reps per
# dispatch, per-rep-varied q, value-fetch sync, median of 11):
#     N=1024 B=128: primary 1.883±0.183 ms, online 2.027±0.137 (0.93x)
#     N=2048 B=64 : primary 2.373±0.223 ms, online 2.853±0.332 (0.83x)
#     N=4096 B=32 : primary 3.623±0.503 ms, online 4.093±0.168 (0.89x)
# (none individually significant by the summed-spread rule, but the
# sign is consistent) — the per-tile rescaling pass costs ~7-17%, so
# the primary stays the route everywhere its plan fits and the online
# variant takes over only beyond N=8192.

_ONLINE_BQ = 256
_ONLINE_BK = 1024


def _pick_online_tiles(n: int) -> tuple[int, int]:
    bq, bk = _ONLINE_BQ, _ONLINE_BK
    while bq > 8 and n % bq:
        bq //= 2
    while bk > 128 and n % bk:
        bk //= 2
    return bq, bk


def _online_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                   *, scale: float, nj: int):
    j = pl.program_id(2)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    @pl.when(j == 0)
    def _init():
        # -inf max => corr = exp(-inf - m_new) = 0 wipes the stale
        # acc/l from the previous q tile without a special case
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, BK] f32
    m_prev = m_ref[...]  # [BQ, 128] lane-replicated statistics
    l_prev = l_ref[...]
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # [BQ, 1]
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    p = jnp.exp(s - m_new[:, :1])
    corr = jnp.exp(m_prev - m_new)  # [BQ, 128], lane-replicated
    l_new = l_prev * corr + jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), l_prev.shape
    )
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, C] f32
    acc_new = acc_ref[...] * corr[:, :1] + pv
    m_ref[...] = m_new
    l_ref[...] = l_new
    acc_ref[...] = acc_new

    @pl.when(j == nj - 1)
    def _emit():
        o_ref[0] = (acc_new / l_new[:, :1]).astype(o_ref.dtype)


def _online_fwd_call(q, k, v, bq: int, bk: int, interpret: bool):
    B, N, C = q.shape
    itemsize = jnp.dtype(q.dtype).itemsize
    scale = float(C) ** -0.5
    nj = N // bk
    q_spec = pl.BlockSpec(
        (1, bq, C), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, bk, C), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_online_kernel, scale=scale, nj=nj),
        grid=(B, N // bq, nj),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, C), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, C), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * N * N * C,
            bytes_accessed=(2 + 2 * (N // bq)) * B * N * C * itemsize,
            transcendentals=2 * B * N * N,
        ),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_online(q, k, v, bq: int, bk: int, interpret: bool):
    return _online_fwd_call(q, k, v, bq, bk, interpret)


def _flash_online_fwd(q, k, v, bq: int, bk: int, interpret: bool):
    return _online_fwd_call(q, k, v, bq, bk, interpret), (q, k, v)


def _flash_online_bwd(bq: int, bk: int, interpret: bool, res, do):
    # identical VJP routing to the primary kernel (whole-k/v backward
    # when it fits, dense fallback) — delegate so a future rule change
    # cannot diverge between the two variants
    return _flash_bwd(bq, interpret, res, do)


_flash_online.defvjp(_flash_online_fwd, _flash_online_bwd)


def flash_attention_online(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Streaming-k/v flash attention; any N with divisible tiles."""
    B, N, C = q.shape
    bq0, bk0 = _pick_online_tiles(N)
    bq = block_q or bq0
    bk = block_k or bk0
    if N % bq or N % bk:
        raise NotImplementedError("token count not divisible by tiles")
    return _flash_online(q, k, v, bq, bk, interpret)


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
    shapes outside every kernel envelope (caller falls back to XLA).
    Differentiable: see the module docstring for the VJP kernel.

    Contract for ``block_q``: an EXPLICIT block_q pins the primary
    whole-k/v kernel with that tile — if the primary cannot serve it
    (indivisible tokens or over-envelope), the call raises rather than
    silently ignoring the override. With block_q=None (the product
    path) any primary refusal auto-routes to the streaming
    online-softmax variant (which picks its own tiles; see the
    section comment above it)."""
    B, N, C = q.shape
    explicit = block_q is not None
    bq = block_q or _pick_block_q(N, C)
    if N % bq != 0:
        if not explicit:
            return flash_attention_online(q, k, v, interpret=interpret)
        raise NotImplementedError("token count not divisible by q tile")
    try:
        _check_envelope(q, bq)
    except NotImplementedError:
        if not explicit:
            return flash_attention_online(q, k, v, interpret=interpret)
        raise
    return _flash(q, k, v, bq, interpret)
