"""Fused upblock epilogue: residual + 1x1 shortcut projection.

Computes ``out = h + concat(pieces, -1) @ kernel + bias`` in ONE pass.

Why: every upblock (and each down-path channel change) ends with a 1x1
shortcut matmul added to the block body's conv3 output (reference:
modules.py:231-236,247-258 — the ``self.shortcut(x)`` residual). On the
XLA path this materializes one f32 partial product per skip piece plus a
separate residual-add fusion: for a level-0 upblock (b128, 64x64, 192ch
concat -> 64ch) that is ~900 MB of HBM traffic per step, measured
HBM-saturated at ~845 GB/s (bf16) — 7% of the bf16 DDIM-100 trace and
12% of the int8 turbo trace (the turbo XLA path additionally quantizes
each raw piece in its own pass). This kernel reads each piece exactly
once, accumulates all piece matmuls in VMEM f32, and adds the residual
and bias in the epilogue: ~268 MB for the same block, a ~3x traffic cut
on a bandwidth-bound op.

The matmul rides the MXU (tiny K = 128..192, N = 64..128 — utilization
is irrelevant, the op is HBM-bound); everything else is VPU epilogue.
Rows (B*H*W) tile over a 1-D grid; weights/bias are grid-invariant so
Pallas keeps them VMEM-resident across tiles.

MEASURED BEHIND XLA end-to-end (v5e DDIM-100 headline: 79.7 -> 53.4
samples/s with this kernel on) despite winning its own op-local traffic
comparison — the canonical fusion-boundary tax, quantified:

1. Layout conversion: pallas_call operands/results take the DEFAULT
   layout while XLA keeps conv activations in {3,0,2,1}; the forced
   conversion passes cost 809 ms/trace (cut to 362 ms by the
   physical-order bitcast transpose below — the kernel OUTPUT feeding
   the next conv still converts).
2. Fusion-anchor loss: in the XLA graph the shortcut dots and residual
   add host fused epilogues/producers for the NEIGHBORING ops (next
   block's GN partial stats ride the add's output fusion; the
   normalize upcast rides its consumer). Extracting the op into a
   custom call strips those anchors: the GN stat/normalize chains
   reappear as standalone HBM passes (+204 ms non-fusion elementwise,
   +230 ms norm1/tail_norm upcast passes).
3. The pallas_call itself runs at 2.3x its bandwidth floor (0.77 vs
   0.33 ms per level-0 block) — Mosaic's pipelining on tall-skinny
   (4096 x 64..192) tiles does not reach the streaming bandwidth XLA's
   own fusions get.

The op-local saving has a hard ceiling of ~80 ms/trace (~5%), an order
of magnitude below the measured boundary taxes — at this model scale
XLA's global layout + fusion planning beats any single-op extraction.
Kept as an opt-in (``INFODIFF_ENABLE_FUSED_SHORTCUT=1``), parity-tested
alternative and as the measured evidence for the futility analysis in
STATUS.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 1024 * 1024


def fused_shortcut_enabled() -> bool:
    """Opt-in (measured 33% BEHIND XLA end-to-end — see the module
    docstring for the fusion-boundary mechanics)."""
    from infodiffusion_tpu.ops.gating import pallas_enabled

    return pallas_enabled("INFODIFF_ENABLE_FUSED_SHORTCUT")


def _kernel(*refs, n_pieces: int):
    h_ref = refs[0]
    p_refs = refs[1 : 1 + n_pieces]
    k_refs = refs[1 + n_pieces : 1 + 2 * n_pieces]
    bias_ref = refs[1 + 2 * n_pieces]
    o_ref = refs[1 + 2 * n_pieces + 1]
    acc = h_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    for p_ref, k_ref in zip(p_refs, k_refs):
        acc = acc + jnp.dot(
            p_ref[:], k_ref[:], preferred_element_type=jnp.float32
        )
    o_ref[:] = acc.astype(o_ref.dtype)


def _pick_tile(M: int, row_bytes: int) -> int:
    """Largest power-of-2 row tile that divides M and fits the VMEM
    budget with pipelining headroom (x2 for double buffering)."""
    tile = 4096
    while tile >= 256:
        if M % tile == 0 and tile * row_bytes * 2 <= _VMEM_BUDGET:
            return tile
        tile //= 2
    return 0


def fused_shortcut_supported(h, pieces) -> bool:
    M = 1
    for d in h.shape[:-1]:
        M *= d
    N = h.shape[-1]
    cs = [p.shape[-1] for p in pieces]
    itemsize = max(h.dtype.itemsize, 2)
    row_bytes = (sum(cs) + 2 * N) * itemsize + 4 * N  # pieces+h+out+f32 acc
    if N % 8 or any(c % 8 for c in cs):
        return False
    return _pick_tile(M, row_bytes) > 0


def fused_shortcut_add(h, pieces, kernel, bias, *, interpret=False):
    """``h + concat(pieces, -1) @ kernel + bias`` (one fused pass).

    h: [..., N]; pieces: list of [..., C_i] (same leading dims);
    kernel: [sum C_i, N]; bias: [N]. Matmul inputs are used in h's
    dtype (the module dtype policy); accumulation is f32.
    """
    shape = h.shape
    N = shape[-1]
    M = 1
    for d in shape[:-1]:
        M *= d
    dtype = h.dtype
    cs = [p.shape[-1] for p in pieces]
    itemsize = max(jnp.dtype(dtype).itemsize, 2)
    row_bytes = (sum(cs) + 2 * N) * itemsize + 4 * N
    tile = _pick_tile(M, row_bytes)
    if tile == 0:
        raise NotImplementedError("no valid row tile for fused shortcut")

    # Physical-order trick: XLA lays conv activations out as
    # {3,0,2,1} (memory order [H][W][B][C]), while pallas_call operands
    # take the DEFAULT layout — flattening [B,H,W,C] row-major would
    # force an 809ms/trace layout-conversion pass around every call
    # (measured). Transposing to [H,W,B,C] first makes the default
    # layout coincide with the physical one, so XLA lowers the
    # transpose (and the inverse on the output) to a free bitcast. The
    # kernel math is row-independent, so row order doesn't matter.
    perm, inv = (1, 2, 0, 3), (2, 0, 1, 3)
    four_d = h.ndim == 4
    if four_d:
        h = jnp.transpose(h, perm)
        pieces = [jnp.transpose(p, perm) for p in pieces]
    h2 = h.reshape(M, N)
    ps = [p.reshape(M, c).astype(dtype) for p, c in zip(pieces, cs)]
    ks = []
    o = 0
    for c in cs:
        ks.append(kernel[o : o + c, :].astype(dtype))
        o += c
    b2 = bias.reshape(1, N).astype(jnp.float32)

    grid = (M // tile,)
    row_spec = lambda C: pl.BlockSpec(  # noqa: E731
        (tile, C), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    inv_spec = lambda A: pl.BlockSpec(  # noqa: E731
        A.shape, lambda i: (0,) * A.ndim, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n_pieces=len(ps)),
        grid=grid,
        in_specs=(
            [row_spec(N)]
            + [row_spec(c) for c in cs]
            + [inv_spec(k) for k in ks]
            + [inv_spec(b2)]
        ),
        out_specs=row_spec(N),
        out_shape=jax.ShapeDtypeStruct((M, N), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),  # row tiles are independent
        ),
        interpret=interpret,
    )(h2, *ps, *ks, b2)
    if four_d:
        return jnp.transpose(out.reshape(h.shape), inv)
    return out.reshape(shape)
