"""Fused [GN/FiLM affine -> SiLU -> int8 quantize -> 3x3 conv -> dequant]
Pallas kernel: the int8 turbo tier's structural-tax attack.

Why this kernel exists (BASELINE.md "Fusion-aware ceiling analysis" item
5): under ``--turbo int8`` the GN/FiLM/SiLU chains that ride conv INPUT
fusions in bf16 must run as separate quantize passes, because XLA cannot
fuse a bf16 elementwise chain into an int8 convolution — a structural
boundary of the compiler, not a hardware floor. Those passes measured
312 ms = 24.4% of the turbo DDIM-100 trace, running at their own HBM
bandwidth floor (600-1100 GB/s). This kernel crosses that boundary the
same way ops/pallas/latent_traj.py crossed the scan-step boundary: the
chain runs on the VPU *in registers* between the bf16 tile load and the
int8 MXU matmul, so the s8 intermediate never exists in HBM and the
standalone pass disappears entirely.

What one kernel invocation computes (NHWC, per ResBlock conv site —
reference modules.py:247-258, the GN->FiLM->SiLU->conv hot block):

    h   = silu(x * A + B)            # A,B: per-(batch, channel) rows that
                                     # collapse GroupNorm-apply + FiLM(s)
                                     # (stats/films computed outside, tiny)
    q_i = clip(round(h_i / s_i))     # per-piece symmetric int8 (static
                                     # calibrated scales, ops/quant.py)
    y   = conv3x3(q, Kq)             # int8 x int8 -> s32 on the MXU
    out = y * sw + bias   [-> bf16]  # act scales pre-FOLDED into Kq's
                                     # input-channel slices (the
                                     # quantize_pieces_folded algebra), so
                                     # dequant is one per-Cout scale

``x`` may be a list of skip-concat PIECES (the UNet upblocks): each
piece quantizes in registers and the conv accumulates across pieces in
s32 *inside the MXU pass* — the bf16 partial-sum spills of the XLA
piece-conv path (67 MB per level-0 upblock step) disappear as well.

Conv-as-shifted-matmul layout (how the 3x3 maps onto the 128x128 MXU):

- width taps dw in {0,1,2} pack into K: the kernel builds
  ``Xcat[m, dw*Ctot + c] = qpad[row, w + dw, c]`` from the W-zero-padded
  int8 tile, so K = 3*Ctot (384 at the flagship's C=128 levels — fully
  lane-aligned; 192 at C=64, 75% util after Mosaic pads to 256);
- height taps dh pack into N: ``Kmat[dw*Ctot+c, dh*Cout+o] =
  Kq[dh, dw, c, o]``, so N = 3*Cout and one matmul per row-tile
  produces all three row-shifted partials, recombined by two sublane-
  shifted s32 adds: ``out[h] = Y[h, 0:C] + Y[h+1, C:2C] + Y[h+2, 2C:]``.
  At C_out=128 this runs (M, 384)x(384, 384) — the MXU shape the
  architecture's own C=64 convs deny XLA (BASELINE.md item 2).
- M = NB*(TH+2)*W flattened (batch-tile x padded-row-tile x width); the
  two halo rows per tile recompute the chain on 2/TH extra rows instead
  of exchanging state across tiles.

Quantization math is IDENTICAL to the XLA turbo path (ops/quant.py):
f32 divide / round-half-even / clip to [-127,127]; the one deliberate
divergence is documented in ``qconv_fused``: the chain keeps f32
precision up to the quantize (the XLA path round-trips through bf16
after the norm), so a small fraction of values land one int8 unit away
— strictly MORE precise, bounded by the int8 grid itself, and far below
the D16 near-pixel tolerance.

The weight-side prep (fold + quantize + pack) runs in plain XLA each
apply — O(params) elementwise, hoisted/fused by XLA exactly like the
existing inline weight quantization (ops/quant.py module docstring).

MEASURED VERDICT (v5e, round 3): the kernel LOSES — opt-in only
(INFODIFF_ENABLE_FUSED_QCONV=1; FORCE for tests). This is the int8
tier's futility dossier, the counterpart of the bf16 dossier in
ops/pallas/shortcut_fused.py (full accounting: BASELINE.md item 7):

- End-to-end: 38.0 vs 100.1 DDIM-100 samples/s (b128, INFODIFF_TURBO=
  int8, this kernel on every flagship site vs the XLA int8 path).
- Per site (50 invocations/dispatch, fetch-synced, vs the kernel's own
  math in isolated XLA): 0.84-1.20x — a wash. In-model the XLA path is
  2-3x faster still, because XLA fuses the bf16 chain into ONE
  bandwidth-floor quantize pass (600-1100 GB/s) and runs the conv with
  its library emitter, overlapped.
- Ablation (the decisive split): a CHAINLESS variant of this kernel
  (pre-quantized s8 in, same zpad/relayout/shifted-matmul/recombine)
  sustains 162-188 int8 TOP/s — at parity with XLA's conv emitter. The
  matmul core is NOT the problem. The in-kernel chain costs 0.6-1.7
  ms/site (3-10x XLA's fused quantize pass) because every f32
  intermediate (xwin, h, sigmoid, round) is a multi-hundred-vreg Mosaic
  vector that spills through VMEM, and that VPU work serializes against
  the MXU matmul (no cross-tile software pipelining).
- Tile sweep (INFODIFF_QCONV_VMEM_MB 10 vs 13): <=20% movement, no sign
  flip. Divide strength-reduction (h*(1/s) for h/s, manual exp-form
  SiLU): <=6%, not the bottleneck.

What WOULD be needed to win: software-pipelining the chain (VPU) of row
tile t+1 against the matmul (MXU) of tile t inside one program, plus
register-blocked chain evaluation — an upside bounded by the 24.4%
quantize tax minus the kernel's own overheads, i.e. <=10% headline.

ROUND-4 VERDICT on that attempt: BUILT (``_kernel_v2``,
INFODIFF_QCONV_V2=1 — double-buffered Xcat scratch, issue order
[matmul(tile t) BEFORE chain(tile t+1)], so the MXU consumer of buffer
t%2 and the VPU producer of buffer (t+1)%2 are textually independent
with no data dependence, which is the only overlap mechanism Mosaic
exposes short of hand-written DMA semaphores on compute) and MEASURED
A WASH (tools/qconv_bench.py, v5e, 20 invocations/dispatch via lax.map
over per-rep-varied A rows, fetch-synced medians of 7):

    site            v1_ms   v2_ms   xla_ms  v2/v1   xla/v2
    l0_conv         2.226   2.430   1.643   0.92x   0.68x
    l1_conv         1.653   1.568   1.344   1.05x   0.86x
    l2_conv         1.333   1.378   1.407   0.97x   1.02x
    l0_up_pieces    2.834   2.848   1.927   1.00x   0.68x
    l1_up_pieces    1.995   1.800   1.810   1.11x   1.01x

Net v2/v1 ~= 1.00 (range 0.92-1.11); v2 stays 0.68x XLA at the two
dominant level-0 sites, vs the ~2.6x gap the chainless ablation bounds.
Reading: making the chain and matmul textually independent does NOT
make Mosaic overlap them — the VPU chain's vreg spills still serialize
through the same VMEM ports the MXU operands stream through, and at
level-0 the doubled (NB,TH+2,W,3*Ctot) s8 scratch halves the planner's
row tile, adding halo recompute that eats the small l1-class gains.
The overlap this design needs is not expressible at the Mosaic
scheduling level; the 24.4% quantize tax stands as the measured
structural floor of the turbo tier (BASELINE.md item 7), and both
kernel variants stay opt-in dossier artifacts.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from infodiffusion_tpu.ops.quant import quantize_weight

_LANE = 128


def _vmem_budget() -> int:
    """Planner budget against Mosaic's 16 MB scoped-VMEM stack limit.

    The sum model in ``_vmem_need`` assumes no buffer reuse; hardware
    measurement (v5e, the flagship f32 smoke shape) showed Mosaic's
    stack accounting lands ~1.5x ABOVE even that pessimistic sum
    (unrolled-tile liveness + relayout copies), so the default budget
    keeps a 6 MB margin. INFODIFF_QCONV_VMEM_MB overrides for tuning."""
    return int(os.environ.get("INFODIFF_QCONV_VMEM_MB", "10")) * 1024 * 1024


def use_fused_qconv() -> bool:
    """Opt-in via its OWN env var (INFODIFF_ENABLE_FUSED_QCONV=1), not
    the INFODIFF_ENABLE_PALLAS umbrella: MEASURED 2.6x SLOWER end-to-end
    than the XLA int8 path (38.0 vs 100.1 DDIM-100 samples/s) — see the
    module docstring's futility dossier. Kept as a parity-tested
    alternative path; the round-4 software-pipelined variant
    (INFODIFF_QCONV_V2=1) measured a wash — see the dossier's
    ROUND-4 VERDICT."""
    if os.environ.get("INFODIFF_DISABLE_FUSED_QCONV") == "1":
        return False
    if os.environ.get("INFODIFF_DISABLE_PALLAS") == "1":
        return False
    if os.environ.get("INFODIFF_FORCE_FUSED_QCONV") == "1":
        return True  # tests: exercise the kernel (interpret) off-TPU
    return (os.environ.get("INFODIFF_ENABLE_FUSED_QCONV") == "1"
            and jax.default_backend() == "tpu")


def _vmem_need(nb, th, H, W, ctot, cout, in_bytes=2, v2=False):
    """Pessimistic (no-reuse SUM) VMEM accounting for plan (nb, th):
    pipelined in/out value blocks plus every named per-tile vector the
    kernel materializes (Mosaic allocates stack for each; measurement
    showed its liveness analysis reuses little across the unrolled tile
    loop, so summing is the honest model). ``v2`` adds the second Xcat
    scratch of the software-pipelined variant."""
    m = nb * (th + 2) * W
    mp = nb * (th + 2) * (W + 2)
    k, n = 3 * ctot, 3 * cout
    return (
        2 * nb * H * W * ctot * in_bytes   # x pieces in (x2 pipeline)
        + 2 * m * ctot * 4                 # f32 chain temps (xwin, h)
        + mp * ctot                        # zero-padded q windows, s8
        + 2 * m * k                        # Xcat scratch + its load, s8
        + (m * k if v2 else 0)             # second Xcat (double buffer)
        + m * n * 4                        # Y s32
        + m * cout * 8                     # acc s32 + outv f32
        + 2 * nb * H * W * cout * 2        # out (x2 pipeline)
        + k * n                            # Kmat s8
        + 2 * 4 * cout                     # sw/bias
    )


def _tile_plan(B: int, H: int, W: int, ctot: int, cout: int, in_bytes=2,
               v2=None):
    """Pick (NB, TH): batch-per-program and internal row-tile. Search
    every feasible combo and keep the largest matmul M = NB*(TH+2)*W
    that fits the VMEM budget (big M amortizes the 2-row halo recompute
    and keeps the MXU fed); None = no feasible plan (the caller falls
    back to the XLA int8 path)."""
    budget = _vmem_budget()
    if v2 is None:
        v2 = _use_v2()
    best, best_m = None, 0
    for nb in (32, 16, 8, 4, 2, 1):
        if B % nb:
            continue
        for th in (H, H // 2, H // 4, H // 8):
            if not th or H % th or (th < 4 and th != H):
                continue
            if H // th > 16:  # static unroll bound on the tile loop
                continue
            m = nb * (th + 2) * W
            if m > 16384:
                continue
            if _vmem_need(nb, th, H, W, ctot, cout, in_bytes,
                          v2=v2) > budget:
                continue
            # prefer bigger M; tie-break toward fewer halo rows (big TH)
            score = m * 100 + th
            if score > best_m:
                best, best_m = (nb, th), score
    return best


def fused_qconv_supported(pieces_shapes, out_ch: int, in_bytes=2) -> bool:
    """Shape gate. Covers every flagship conv1/2/3 site (stride-1,
    no-repeat, C in {64,128,192,256}); anything else falls back to the
    XLA int8 path in nn/blocks.py. ``in_bytes`` is the piece dtype's
    itemsize (bf16 product path = 2; the f32 tests plan smaller tiles)."""
    if not pieces_shapes:
        return False
    lead = pieces_shapes[0][:-1]
    if len(lead) != 3:  # NHWC only (latent 1-D convs don't come here)
        return False
    B, H, W = lead
    if any(tuple(s[:-1]) != tuple(lead) for s in pieces_shapes):
        return False
    ctot = sum(s[-1] for s in pieces_shapes)
    if ctot % 32 or out_ch % 32:
        return False
    if H < 4 or W < 4 or W > 256:
        return False
    return _tile_plan(B, H, W, ctot, out_ch, in_bytes) is not None


def _kernel(n_pieces, NB, TH, H, W, ctot, cout, out_dtype, *refs):
    """One grid program = NB batch samples, full H (looped in TH tiles).

    refs layout: [x_1..x_n, A, B, s, Kmat, sw, bias, out, xcat_scratch]."""
    xs = refs[:n_pieces]
    a_ref, b_ref, s_ref, kmat_ref, swb_ref = refs[n_pieces : n_pieces + 5]
    out_ref = refs[-2]
    xcat_ref = refs[-1]

    kmat = kmat_ref[:]  # (3*ctot, 3*cout) int8, resident across tiles
    swb = swb_ref[:].astype(jnp.float32)  # (2, cout): [sw; bias]
    sw = swb[0:1, :]
    bias = swb[1:2, :]

    def _zpad(q, top, bot):
        """Zero rows at tile edges + the 1-column W borders, via concat
        (jnp.pad's lax.pad primitive is not guaranteed in Mosaic)."""
        nb, r, w, c = q.shape
        z = lambda *s: jnp.zeros(s, jnp.int8)
        parts = []
        if top:
            parts.append(z(nb, top, w, c))
        parts.append(q)
        if bot:
            parts.append(z(nb, bot, w, c))
        q = jnp.concatenate(parts, axis=1) if len(parts) > 1 else q
        zc = z(nb, q.shape[1], 1, c)
        return jnp.concatenate([zc, q, zc], axis=2)

    n_tiles = H // TH
    for ht in range(n_tiles):  # static unroll (<= 8 tiles)
        r0 = ht * TH - 1  # input row of padded-tile row 0
        # --- chain + quantize the (TH+2)-row window, zero-padded W ---
        off = 0
        qrows = []
        for i in range(n_pieces):
            ci = xs[i].shape[-1]
            lo = max(0, r0)
            hi = min(H, r0 + TH + 2)
            xwin = xs[i][:, lo:hi, :, :].astype(jnp.float32)
            # A/B ride as [NB, 1, 1, Ctot] (the 4-D layout keeps the
            # Mosaic last-two-dims tiling rule satisfied at every NB)
            aw = a_ref[:, 0, 0, off : off + ci].astype(jnp.float32)
            bw = b_ref[:, 0, 0, off : off + ci].astype(jnp.float32)
            h = xwin * aw[:, None, None, :] + bw[:, None, None, :]
            h = h * jax.nn.sigmoid(h)  # SiLU, f32
            si = s_ref[0, i]
            q = jnp.clip(jnp.round(h / si), -127.0, 127.0).astype(jnp.int8)
            top = 1 if r0 < 0 else 0
            bot = (TH + 2) - (hi - lo) - top
            qrows.append(_zpad(q, top, bot))  # (NB, TH+2, W+2, ci)
            off += ci
        # --- Xcat: width taps into K, assembled through a VMEM scratch.
        # The dw-shifted slices carry sublane offsets 0/1/2, and Mosaic's
        # tpu.concatenate refuses lane concats whose inputs disagree on a
        # non-concat-dim offset; a store relayouts the value instead (the
        # canonical realign-via-memory move — measured supported at every
        # flagship lane offset, incl. the 64-multiples of ctot=192).
        off = 0
        for i, q in enumerate(qrows):
            ci = q.shape[-1]
            for dw in range(3):
                o0 = dw * ctot + off
                xcat_ref[:, :, :, o0 : o0 + ci] = q[:, :, dw : dw + W, :]
            off += ci
        xcat = xcat_ref[:]  # (NB, TH+2, W, 3*ctot), piece-major per dw
        m = NB * (TH + 2) * W
        y = jnp.dot(
            xcat.reshape(m, 3 * ctot), kmat,
            preferred_element_type=jnp.int32,
        ).reshape(NB, TH + 2, W, 3 * cout)
        # --- height taps: row-shifted s32 recombine ---
        acc = (
            y[:, 0:TH, :, 0:cout]
            + y[:, 1 : TH + 1, :, cout : 2 * cout]
            + y[:, 2 : TH + 2, :, 2 * cout : 3 * cout]
        )
        outv = acc.astype(jnp.float32) * sw[:, None, None, :] + (
            bias[:, None, None, :]
        )
        out_ref[:, ht * TH : (ht + 1) * TH, :, :] = outv.astype(out_dtype)


def _use_v2() -> bool:
    """Round-4 software-pipelined variant (the dossier's own 'what
    WOULD be needed'): double-buffered Xcat scratch + issue order
    [matmul(tile t) BEFORE chain(tile t+1)], so the MXU matmul of tile
    t and the VPU chain of tile t+1 are textually independent and
    Mosaic's scheduler is free to overlap them. INFODIFF_QCONV_V2=1
    selects it wherever the fused kernel itself is enabled."""
    return os.environ.get("INFODIFF_QCONV_V2") == "1"


def _kernel_v2(n_pieces, NB, TH, H, W, ctot, cout, out_dtype, *refs):
    """Software-pipelined variant of :func:`_kernel` (same math, same
    refs + one extra Xcat scratch): tile t+1's chain/quantize (VPU)
    fills one Xcat buffer while tile t's shifted matmul (MXU) consumes
    the other. The chain also stores each piece's quantized window
    straight into the scratch slot (no qrows list kept live across the
    relayout), shrinking the f32 live set Mosaic must hold."""
    xs = refs[:n_pieces]
    a_ref, b_ref, s_ref, kmat_ref, swb_ref = refs[n_pieces : n_pieces + 5]
    out_ref = refs[-3]
    xcat_refs = (refs[-2], refs[-1])

    kmat = kmat_ref[:]
    swb = swb_ref[:].astype(jnp.float32)
    sw = swb[0:1, :]
    bias = swb[1:2, :]

    def _zpad(q, top, bot):
        nb, r, w, c = q.shape
        z = lambda *s: jnp.zeros(s, jnp.int8)  # noqa: E731
        parts = []
        if top:
            parts.append(z(nb, top, w, c))
        parts.append(q)
        if bot:
            parts.append(z(nb, bot, w, c))
        q = jnp.concatenate(parts, axis=1) if len(parts) > 1 else q
        zc = z(nb, q.shape[1], 1, c)
        return jnp.concatenate([zc, q, zc], axis=2)

    n_tiles = H // TH

    def chain_tile(ht, slot):
        """GN/FiLM/SiLU + quantize + zpad + width-tap store for one
        (TH+2)-row window, written into xcat_refs[slot]."""
        r0 = ht * TH - 1
        off = 0
        for i in range(n_pieces):
            ci = xs[i].shape[-1]
            lo = max(0, r0)
            hi = min(H, r0 + TH + 2)
            xwin = xs[i][:, lo:hi, :, :].astype(jnp.float32)
            aw = a_ref[:, 0, 0, off : off + ci].astype(jnp.float32)
            bw = b_ref[:, 0, 0, off : off + ci].astype(jnp.float32)
            h = xwin * aw[:, None, None, :] + bw[:, None, None, :]
            h = h * jax.nn.sigmoid(h)
            si = s_ref[0, i]
            q = jnp.clip(jnp.round(h / si), -127.0, 127.0).astype(jnp.int8)
            top = 1 if r0 < 0 else 0
            bot = (TH + 2) - (hi - lo) - top
            q = _zpad(q, top, bot)
            for dw in range(3):
                o0 = dw * ctot + off
                xcat_refs[slot][:, :, :, o0 : o0 + ci] = (
                    q[:, :, dw : dw + W, :]
                )
            off += ci

    m = NB * (TH + 2) * W
    chain_tile(0, 0)  # prologue: fill buffer 0
    for ht in range(n_tiles):
        xcat = xcat_refs[ht % 2][:]
        # MXU consumes buffer ht%2 ...
        y = jnp.dot(
            xcat.reshape(m, 3 * ctot), kmat,
            preferred_element_type=jnp.int32,
        ).reshape(NB, TH + 2, W, 3 * cout)
        # ... while the VPU chain of the NEXT tile fills the other
        # buffer (no data dependence on y — the scheduler may overlap)
        if ht + 1 < n_tiles:
            chain_tile(ht + 1, (ht + 1) % 2)
        acc = (
            y[:, 0:TH, :, 0:cout]
            + y[:, 1 : TH + 1, :, cout : 2 * cout]
            + y[:, 2 : TH + 2, :, 2 * cout : 3 * cout]
        )
        outv = acc.astype(jnp.float32) * sw[:, None, None, :] + (
            bias[:, None, None, :]
        )
        out_ref[:, ht * TH : (ht + 1) * TH, :, :] = outv.astype(out_dtype)


def _fold_pack(kernel, s_act, piece_channels):
    """Fold per-piece act scales into the kernel's input-channel slices,
    jointly weight-quantize per output channel, and pack for the
    shifted-matmul layout. Matches ops/quant.py quantize_pieces_folded
    exactly; the dw-major/piece-major K ordering mirrors the kernel's
    Xcat concat order."""
    kf = kernel.astype(jnp.float32)
    slices, o = [], 0
    for i, c in enumerate(piece_channels):
        slices.append(kf[:, :, o : o + c, :] * s_act[i])
        o += c
    keff = jnp.concatenate(slices, axis=2)  # (3,3,Ctot,Cout)
    kq, sw = quantize_weight(keff, (0, 1, 2))
    # Kmat[dw*Ctot + c, dh*Cout + o] = kq[dh, dw, c, o]
    ctot, cout = keff.shape[2], keff.shape[3]
    kmat = kq.transpose(1, 2, 0, 3).reshape(3 * ctot, 3 * cout)
    return kmat, sw


def qconv_fused(
    pieces: Sequence[jnp.ndarray],
    A: jnp.ndarray,
    B: jnp.ndarray,
    absmax: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """``conv3x3(q8(silu(concat(pieces)*A + B)), q8(kernel))`` dequantized
    to ``out_dtype``, as ONE Pallas pass.

    pieces: bf16/f32 [Bt,H,W,C_i] (1 = plain conv, 2 = UNet skip-concat);
    A, B: f32 [Bt, Ctot] — the collapsed GN-apply+FiLM affine rows;
    absmax: f32 [n_pieces] calibrated |max| per piece (ops/quant.py);
    kernel: f32 [3,3,Ctot,Cout] (the UN-quantized param — folding +
    quantization + packing happen here, in XLA); bias: f32 [Cout].

    Deliberate precision divergence vs the XLA turbo path: the chain
    stays f32 through the quantize (XLA's adagn casts to the module
    dtype — bf16 — before silu/quantize), so isolated values may land
    one int8 unit apart. Bounded by the int8 grid; see PARITY.md D16.
    """
    pieces = list(pieces)
    n = len(pieces)
    Bt, H, W, _ = pieces[0].shape
    cs = [int(p.shape[-1]) for p in pieces]
    ctot = sum(cs)
    cout = int(kernel.shape[-1])
    in_bytes = max(p.dtype.itemsize for p in pieces)
    plan = _tile_plan(Bt, H, W, ctot, cout, in_bytes)
    assert plan is not None, (Bt, H, W, ctot, cout, in_bytes)
    NB, TH = plan

    s_act = jnp.maximum(absmax.astype(jnp.float32).reshape(n), 1e-30) / 127.0
    kmat, sw = _fold_pack(kernel, s_act, cs)
    swb = jnp.stack([sw.astype(jnp.float32),
                     bias.astype(jnp.float32)])  # (2, Cout)

    kern = functools.partial(
        _kernel_v2 if _use_v2() else _kernel,
        n, NB, TH, H, W, ctot, cout, out_dtype,
    )
    grid = (Bt // NB,)
    in_specs = [
        pl.BlockSpec((NB, H, W, c), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        for c in cs
    ] + [
        pl.BlockSpec((NB, 1, 1, ctot), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),  # A
        pl.BlockSpec((NB, 1, 1, ctot), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),  # B
        pl.BlockSpec((1, n), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),  # s_act
        pl.BlockSpec((3 * ctot, 3 * cout), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),  # Kmat
        pl.BlockSpec((2, cout), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),  # sw/bias
    ]
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((NB, H, W, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bt, H, W, cout), out_dtype),
        scratch_shapes=(
            [pltpu.VMEM((NB, TH + 2, W, 3 * ctot), jnp.int8)] * 2
            if _use_v2()
            else [pltpu.VMEM((NB, TH + 2, W, 3 * ctot), jnp.int8)]
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Bt * H * W * 9 * ctot * cout,
            bytes_accessed=(
                Bt * H * W * (2 * ctot + 2 * cout) + 9 * ctot * cout
            ),
            transcendentals=Bt * H * W * ctot,
        ),
    )(
        *pieces,
        A.astype(jnp.float32).reshape(Bt, 1, 1, ctot),
        B.astype(jnp.float32).reshape(Bt, 1, 1, ctot),
        s_act.reshape(1, n),
        kmat,
        swb,
    )
    return out


def qconv_reference(pieces, A, B, absmax, kernel, bias,
                    out_dtype=jnp.bfloat16):
    """Plain-XLA oracle implementing the kernel's EXACT math (f32 chain,
    folded scales, s32 conv, single dequant) — the parity target for
    tests/test_qconv.py."""
    pieces = list(pieces)
    n = len(pieces)
    cs = [int(p.shape[-1]) for p in pieces]
    s_act = jnp.maximum(absmax.astype(jnp.float32).reshape(n), 1e-30) / 127.0
    kf = kernel.astype(jnp.float32)  # folding below mirrors _fold_pack
    slices, o = [], 0
    for i, c in enumerate(cs):
        slices.append(kf[:, :, o : o + c, :] * s_act[i])
        o += c
    kq, sw = quantize_weight(jnp.concatenate(slices, axis=2), (0, 1, 2))
    qs, o = [], 0
    for i, p in enumerate(pieces):
        c = cs[i]
        h = p.astype(jnp.float32) * A[:, None, None, o : o + c] + (
            B[:, None, None, o : o + c]
        )
        h = h * jax.nn.sigmoid(h)
        qs.append(
            jnp.clip(jnp.round(h / s_act[i]), -127.0, 127.0).astype(jnp.int8)
        )
        o += c
    xq = jnp.concatenate(qs, axis=-1)
    y = lax.conv_general_dilated(
        xq, kq, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * sw + bias.astype(jnp.float32)
    return out.astype(out_dtype)
