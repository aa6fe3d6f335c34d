"""GroupNorm and fused GroupNorm+FiLM (AdaGN) ops.

The reference's conditioned ResBlocks compute

    h = GN(h) * (1 + s_t) + b_t            (time FiLM)
    h = h * (1 + s_a) + b_a                (aux FiLM, AuxResBlock only)

(reference: modules.py:247-258, 309-318). On TPU the whole chain is one
bandwidth-bound elementwise pass after a per-(batch, group) reduction, so
we expose it as a single op XLA can fuse; a Pallas kernel provides the
explicitly-fused variant for the training hot path.

Layout: NHWC. ``num_groups`` groups over the channel (last) axis; stats
are computed in f32 regardless of activation dtype (bf16-safe).

Skip-concat inputs: UNet upblocks normalize ``concat(h, skip)`` —
:func:`group_norm_pieces` computes that WITHOUT materializing the concat
(per-piece producer-fused stats, per-piece normalization), and the
blocks' piece convs consume the normalized pieces directly
(nn/blocks.py).
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-5  # torch GroupNorm default (parity)


def _use_pallas() -> bool:
    # Measured on v5e (round 1): XLA's own fusions beat the first-cut
    # per-batch-element Pallas kernels on the flagship bench (68.8 vs
    # 51.3 DDIM-100 samples/s), so the XLA path is the default and the
    # kernels are opt-in until they win (shared gate: ops/gating.py).
    from infodiffusion_tpu.ops.gating import pallas_enabled

    return pallas_enabled()


def _ablate_stats() -> bool:
    # DIAGNOSTIC ONLY (not parity-correct): constant stats, so the
    # stats reductions vanish from the program — used to attribute
    # their cost in the sampler roofline analysis (tools/).
    return os.environ.get("INFODIFF_ABLATE_GN_STATS") == "1"


def _const_stats(B: int, num_groups: int):
    shape = (B, 1, num_groups, 1)
    return jnp.zeros(shape, jnp.float32), jnp.ones(shape, jnp.float32)


def _var_to_rstd(var: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.rsqrt(jnp.maximum(var, 0.0) + _EPS)


def _split_stats() -> bool:
    """Layout experiment (round 4) — MEASURED NEGATIVE, kept as the
    parity-tested dossier knob (tools/layout_probe.py has the full
    story). Computing the GN spatial sums as two HALF-W reductions
    (a [*, 64, 64] half has no W-minor lane advantage) does keep the
    level-0 chains in the convs' C-minor layout and removes 70% of the
    128px relayout copy bytes (2872 -> 859 MB/forward) — but the
    copies were buying VMEM-staged full-lane VPU work, and C-minor
    chains pay 2x lane padding on every HBM pass instead: wall-clock
    WASH on the forward probe, 30% SLOWER on the real 128px DDIM-100
    bench (10.53 vs 14.94 samples/s, b128). XLA's relayout scheme
    wins; do not enable in production."""
    return os.environ.get("INFODIFF_GN_SPLIT_STATS") == "1"


def _dot_stats() -> bool:
    """Layout experiment (round 4) — MEASURED NO-OP: computing the GN
    per-channel sums as a dot_general against a ones vector changes
    neither the copy profile nor the time (the copy table is
    byte-identical — XLA strength-reduces the dot-with-ones back
    before layout assignment). Kept as the parity-tested record."""
    return os.environ.get("INFODIFF_GN_DOT_STATS") == "1"


def _spatial_sums_dot(xf3: jnp.ndarray):
    """(sum, sum_sq) over the spatial axis of [B, S, C] f32 via
    dot_general — one MXU pass reading x once (the two contractions
    share the operand)."""
    ones = jnp.ones((xf3.shape[1],), jnp.float32)
    dims = (((1,), (0,)), ((), ()))
    s1 = jax.lax.dot_general(xf3, ones, dims)
    s2 = jax.lax.dot_general(jnp.square(xf3), ones, dims)
    return s1, s2


def _gn_stats(x: jnp.ndarray, num_groups: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(batch, group) mean/rstd in f32. x: [..., C]."""
    *lead, C = x.shape
    assert C % num_groups == 0, f"channels {C} not divisible by {num_groups}"
    if _ablate_stats():
        return _const_stats(x.shape[0], num_groups)
    B = x.shape[0]
    if _split_stats() and x.ndim == 4 and x.shape[2] % 2 == 0:
        xf = x.astype(jnp.float32)
        halves = [xf[:, :, : x.shape[2] // 2, :],
                  xf[:, :, x.shape[2] // 2 :, :]]
        s1 = sum(jnp.sum(h, axis=(1, 2)) for h in halves)  # [B, C]
        s2 = sum(jnp.sum(jnp.square(h), axis=(1, 2)) for h in halves)
        g1 = s1.reshape(B, num_groups, C // num_groups).sum(-1)
        g2 = s2.reshape(B, num_groups, C // num_groups).sum(-1)
        count = x.shape[1] * x.shape[2] * (C // num_groups)
        mean = (g1 / count).reshape(B, 1, num_groups, 1)
        msq = (g2 / count).reshape(B, 1, num_groups, 1)
        return mean, _var_to_rstd(msq - jnp.square(mean))
    if _dot_stats():
        xf3 = x.astype(jnp.float32).reshape(B, -1, C)
        s1, s2 = _spatial_sums_dot(xf3)  # [B, C]
        g1 = s1.reshape(B, num_groups, C // num_groups).sum(-1)
        g2 = s2.reshape(B, num_groups, C // num_groups).sum(-1)
        count = xf3.shape[1] * (C // num_groups)
        mean = (g1 / count).reshape(B, 1, num_groups, 1)
        msq = (g2 / count).reshape(B, 1, num_groups, 1)
        return mean, _var_to_rstd(msq - jnp.square(mean))
    xf = x.astype(jnp.float32).reshape(B, -1, num_groups, C // num_groups)
    # one-pass stats (E[x^2] - mean^2): both reductions land in ONE XLA
    # fusion reading x once, vs two passes for the (x - mean)^2 form —
    # GN is bandwidth-bound so this halves its stats traffic. f32
    # accumulation keeps the cancellation benign at these magnitudes
    # (torch GroupNorm computes Welford/one-pass variance too).
    mean = xf.mean(axis=(1, 3), keepdims=True)
    mean_sq = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True)
    return mean, _var_to_rstd(mean_sq - jnp.square(mean))


def _gn_stats_from_pieces(
    pieces: Sequence[jnp.ndarray], num_groups: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GroupNorm stats of ``concat(pieces, -1)`` computed from per-piece
    per-channel spatial sums — same math as :func:`_gn_stats` (one-pass
    E[x^2]-mean^2 in f32, reassociated), but each piece's reduction is a
    consumer of that piece alone, so XLA fuses it into the piece's
    PRODUCER fusion instead of emitting one standalone pass that re-reads
    the whole concatenated tensor from HBM. On the flagship sampler the
    level-0 upblock concat-input norms were the only stats not already
    fused into a producer (35.8 ms/rep standalone reads — see STATUS.md
    roofline attribution)."""
    B = pieces[0].shape[0]
    C = sum(p.shape[-1] for p in pieces)
    assert C % num_groups == 0, f"channels {C} not divisible by {num_groups}"
    if _ablate_stats():
        return _const_stats(B, num_groups)
    spatial_axes = tuple(range(1, pieces[0].ndim - 1))
    n_spatial = 1
    for ax in spatial_axes:
        n_spatial *= pieces[0].shape[ax]
    if (_split_stats() and pieces[0].ndim == 4
            and pieces[0].shape[2] % 2 == 0):
        W2 = pieces[0].shape[2] // 2

        def _half_sums(p):
            pf = p.astype(jnp.float32)
            hs = [pf[:, :, :W2, :], pf[:, :, W2:, :]]
            return (sum(jnp.sum(h, axis=(1, 2)) for h in hs),
                    sum(jnp.sum(jnp.square(h), axis=(1, 2)) for h in hs))

        sums = [_half_sums(p) for p in pieces]
        s1 = jnp.concatenate([s[0] for s in sums], axis=-1)  # [B, C]
        s2 = jnp.concatenate([s[1] for s in sums], axis=-1)
    elif _dot_stats():
        sums = [
            _spatial_sums_dot(
                p.astype(jnp.float32).reshape(B, -1, p.shape[-1])
            )
            for p in pieces
        ]
        s1 = jnp.concatenate([s[0] for s in sums], axis=-1)  # [B, C]
        s2 = jnp.concatenate([s[1] for s in sums], axis=-1)
    else:
        s1 = jnp.concatenate(
            [jnp.sum(p.astype(jnp.float32), axis=spatial_axes)
             for p in pieces],
            axis=-1,
        )  # [B, C]
        s2 = jnp.concatenate(
            [
                jnp.sum(jnp.square(p.astype(jnp.float32)), axis=spatial_axes)
                for p in pieces
            ],
            axis=-1,
        )
    g1 = s1.reshape(B, num_groups, C // num_groups).sum(-1)
    g2 = s2.reshape(B, num_groups, C // num_groups).sum(-1)
    count = n_spatial * (C // num_groups)
    mean = g1 / count
    rstd = _var_to_rstd(g2 / count - jnp.square(mean))
    shape = (B, 1, num_groups, 1)
    return mean.reshape(shape), rstd.reshape(shape)


def group_norm_pieces(
    pieces: Sequence[jnp.ndarray],
    num_groups: int,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
):
    """GroupNorm of ``concat(pieces, -1)`` returned as UN-concatenated
    normalized pieces. Combined with convs that distribute over the
    channel concat (``conv(concat(a,b), W) = conv(a, W_a) + conv(b, W_b)``,
    see nn/blocks.py piece convs), the concatenated tensor never
    materializes in HBM at all: stats fuse into each piece's producer
    (:func:`_gn_stats_from_pieces`), normalization is elementwise per
    piece, and each downstream conv reads the pieces directly. Piece
    channel boundaries need not align with group boundaries — group stats
    are broadcast to a per-channel vector first."""
    pieces = list(pieces)
    assert all(p.shape[:-1] == pieces[0].shape[:-1] for p in pieces)
    B = pieces[0].shape[0]
    C = sum(p.shape[-1] for p in pieces)
    mean, rstd = _gn_stats_from_pieces(pieces, num_groups)  # [B,1,G,1]
    gsize = C // num_groups
    mean_c = jnp.repeat(mean.reshape(B, num_groups), gsize, axis=-1)  # [B,C]
    rstd_c = jnp.repeat(rstd.reshape(B, num_groups), gsize, axis=-1)
    lead = (B,) + (1,) * (pieces[0].ndim - 2)
    out = []
    o = 0
    for p in pieces:
        c = p.shape[-1]
        m = mean_c[:, o : o + c].reshape(lead + (c,))
        r = rstd_c[:, o : o + c].reshape(lead + (c,))
        s = scale[o : o + c].astype(jnp.float32)
        b = bias[o : o + c].astype(jnp.float32)
        h = (p.astype(jnp.float32) - m) * r * s + b
        out.append(h.astype(p.dtype))
        o += c
    return out


def group_norm(
    x: jnp.ndarray,
    num_groups: int,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
) -> jnp.ndarray:
    """Plain GroupNorm over the last axis of an NHWC (or [B, N, C])
    tensor. For skip-concat inputs use :func:`group_norm_pieces`."""
    B, C = x.shape[0], x.shape[-1]
    mean, rstd = _gn_stats(x, num_groups)
    xf = x.astype(jnp.float32).reshape(B, -1, num_groups, C // num_groups)
    h = (xf - mean) * rstd
    h = h.reshape(x.shape)
    h = h * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return h.astype(x.dtype)


def group_norm_affine(
    x,
    num_groups: int,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    films: Sequence[Tuple[jnp.ndarray, jnp.ndarray]] = (),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Collapse the whole GroupNorm-apply + FiLM chain into per-(batch,
    channel) affine rows: returns f32 ``(A, B)`` of shape [B, C] with

        adagn(x, ...) == x * A[:, None, None, :] + B[:, None, None, :]

    (exact up to f32 reassociation). ``x`` may be one array or the
    skip-concat piece list (joint stats, :func:`_gn_stats_from_pieces`).
    The rows feed the fused quantize-conv Pallas kernel
    (ops/pallas/qconv.py), which runs the chain in registers; they are
    O(B*C) to build, so the stats reductions stay the only HBM pass.
    """
    if isinstance(x, (tuple, list)):
        B = x[0].shape[0]
        C = sum(p.shape[-1] for p in x)
        mean, rstd = _gn_stats_from_pieces(list(x), num_groups)
    else:
        B, C = x.shape[0], x.shape[-1]
        mean, rstd = _gn_stats(x, num_groups)
    gsize = C // num_groups
    mean_c = jnp.repeat(mean.reshape(B, num_groups), gsize, axis=-1)
    rstd_c = jnp.repeat(rstd.reshape(B, num_groups), gsize, axis=-1)
    s = scale.astype(jnp.float32)[None, :]
    A = rstd_c * s
    Brow = bias.astype(jnp.float32)[None, :] - mean_c * A
    for fs, fb in films:
        fs = fs.astype(jnp.float32)
        fb = fb.astype(jnp.float32)
        A = A * (1.0 + fs)
        Brow = Brow * (1.0 + fs) + fb
    return A, Brow


def adagn(
    x: jnp.ndarray,
    num_groups: int,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    films: Sequence[Tuple[jnp.ndarray, jnp.ndarray]] = (),
) -> jnp.ndarray:
    """GroupNorm followed by FiLM modulations ``h = h*(1+s) + b`` applied in
    order — one for ResBlock (time), two for AuxResBlock (time then aux)
    (reference: modules.py:247-258, 309-318).

    x: [B, H, W, C] (or [B, N, C]); each (s, b) in ``films``: [B, C],
    broadcast over the spatial axes.
    """
    if _use_pallas():
        from infodiffusion_tpu.ops.pallas.adagn import adagn_pallas

        try:
            return adagn_pallas(x, num_groups, scale, bias, films)
        except NotImplementedError:
            pass
    h = group_norm(x, num_groups, scale, bias).astype(jnp.float32)
    expand = (slice(None),) + (None,) * (x.ndim - 2) + (slice(None),)
    for s, b in films:
        s = s.astype(jnp.float32)[expand]
        b = b.astype(jnp.float32)[expand]
        h = h * (1.0 + s) + b
    return h.astype(x.dtype)
