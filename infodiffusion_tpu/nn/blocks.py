"""ResBlocks, resampling and MLP blocks (reference: modules.py:63-366).

NHWC, Flax linen. The AdaGN modulate (GroupNorm then one or two FiLMs)
routes through ``ops.adagn`` so the normalize+modulate chain is a single
fusable op (Pallas on TPU).

Structure parity notes:
- ``ResBlock`` has *three* conv stages (reference: modules.py:213-229):
  block1 = GN-SiLU-conv, block2 = [GN+FiLM(t)]-SiLU-drop-conv,
  block3 = GN-SiLU-drop-conv, then +shortcut, then optional attention.
- ``AuxResBlock`` adds a second FiLM from the aux embedding right after
  the time FiLM (reference: modules.py:312-318).
- ``EncoderResBlock`` is the 2-stage unconditioned variant
  (reference: modules.py:331-366).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from infodiffusion_tpu.nn.initializers import DEFAULT_KERNEL, zeros
from infodiffusion_tpu.ops import adagn
from infodiffusion_tpu.ops.norm import group_norm as gn_op
from infodiffusion_tpu.ops.norm import group_norm_affine
from infodiffusion_tpu.ops.norm import group_norm_pieces as gn_pieces_op
from infodiffusion_tpu.ops import quant as q8

_GROUPS = 32


class _AffineChain(NamedTuple):
    """The GN/FiLM/SiLU chain handed to a conv UN-materialized, for the
    fused quantize-conv Pallas kernel (ops/pallas/qconv.py): the conv
    input is ``silu(concat(pieces) * A + B)`` with f32 rows A, B of
    shape [batch, C_total] (ops/norm.py group_norm_affine). Produced by
    :class:`_GNParams` only when the int8 turbo tier is active and the
    fused kernel will consume it; every conv accepting one must either
    run the kernel or :func:`_materialize_chain` it."""

    pieces: Tuple[jnp.ndarray, ...]
    A: jnp.ndarray
    B: jnp.ndarray


def _materialize_chain(chain: _AffineChain, dtype):
    """Defensive fallback: compute the chain in XLA (matching the normal
    path's dtype flow — affine in f32, cast to module dtype, silu) and
    return post-silu pieces."""
    out, o = [], 0
    for p in chain.pieces:
        c = p.shape[-1]
        h = p.astype(jnp.float32) * chain.A[:, None, None, o : o + c] + (
            chain.B[:, None, None, o : o + c]
        )
        out.append(nn.silu(h.astype(dtype)))
        o += c
    return out


def _qconv_interpret() -> bool:
    # tests force the kernel off-TPU via INFODIFF_FORCE_FUSED_QCONV=1;
    # there it must run in interpret mode
    return jax.default_backend() != "tpu"


class Conv3(nn.Module):
    """torch Conv2d(k=3, stride=s, padding=1) — explicit symmetric
    padding, not 'SAME' (asymmetric for stride 2), for exact spatial
    parity. Param tree identical to ``nn.Conv`` (kernel [3,3,Cin,Cout] +
    bias), so checkpoints are interchangeable.

    int8 turbo tier (ops/quant.py): when a 'quant' variable collection is
    mutable the call OBSERVES its input range (calibration); when the
    collection is present read-only it runs the W8A8 int8 MXU path.
    ``quantize=False`` pins quality-critical convs (the image head/tail)
    to the normal dtype policy.

    ``repeat=2`` fuses a nearest-x2 upsample in front of the conv
    (UpSample). In turbo mode the input quantizes at the SMALL
    resolution and the repeat runs on int8 (|x| is invariant under
    repeat, so the calibrated scale transfers exactly) — the
    materialized upsampled tensor is half the bytes and the separate
    post-repeat quantize pass disappears (~235 MB/step saved at the
    level-1 upsample)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    strides: int = 1
    quantize: bool = True
    repeat: int = 1

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        chain = x if isinstance(x, _AffineChain) else None
        cin = (
            sum(p.shape[-1] for p in chain.pieces)
            if chain is not None
            else x.shape[-1]
        )
        kernel = self.param(
            "kernel", DEFAULT_KERNEL, (3, 3, cin, self.features), jnp.float32
        )
        bias = self.param("bias", zeros, (self.features,), jnp.float32)
        if chain is not None:
            if (self.quantize and self.strides == 1 and self.repeat == 1
                    and self.has_variable("quant", "act_absmax")
                    and not self.is_mutable_collection("quant")):
                from infodiffusion_tpu.ops.pallas.qconv import qconv_fused

                absmax = self.variable("quant", "act_absmax").value
                return qconv_fused(
                    list(chain.pieces), chain.A, chain.B,
                    absmax.reshape(-1), kernel, bias, self.dtype,
                    interpret=_qconv_interpret(),
                )
            (x,) = _materialize_chain(chain, self.dtype)
        s = (self.strides, self.strides)
        pad = ((1, 1), (1, 1))
        rep = (
            (lambda z: jnp.repeat(jnp.repeat(z, self.repeat, axis=1),
                                  self.repeat, axis=2))
            if self.repeat > 1 else (lambda z: z)
        )
        if (self.quantize and self.is_mutable_collection("quant")
                and not self.is_initializing()):
            q8.observe_absmax(self, x)  # pre-repeat: same |max|
        elif self.quantize and self.has_variable("quant", "act_absmax"):
            absmax = self.variable("quant", "act_absmax").value
            kq, sw = q8.quantize_weight(kernel, (0, 1, 2))
            xq, sx = q8.quantize_act(x, absmax)
            y = q8.int8_conv(rep(xq), kq, s, pad)
            y = y.astype(jnp.float32) * (sx * sw) + bias.astype(jnp.float32)
            return y.astype(self.dtype)
        (kernel, bias, x) = nn.dtypes.promote_dtype(
            kernel, bias, x, dtype=self.dtype
        )
        y = jax.lax.conv_general_dilated(
            rep(x), kernel, s, pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return y + bias


def _conv3(features: int, dtype, name: str, strides: int = 1,
           quantize: bool = True, repeat: int = 1) -> Conv3:
    return Conv3(features, dtype, strides, quantize, repeat, name=name)


def _try_fused_shortcut(residual, pieces, kernel, bias):
    """The fused residual+shortcut epilogue (one Pallas pass; see
    ops/pallas/shortcut_fused.py). Returns None when disabled or the
    shapes don't tile."""
    if residual is None:
        return None
    from infodiffusion_tpu.ops.pallas.shortcut_fused import (
        fused_shortcut_add,
        fused_shortcut_enabled,
        fused_shortcut_supported,
    )

    if not (fused_shortcut_enabled()
            and fused_shortcut_supported(residual, pieces)):
        return None
    return fused_shortcut_add(residual, pieces, kernel, bias)


class ShortcutDense(nn.Module):
    """``nn.Dense`` for the ResBlock 1x1 shortcut projection. Param tree
    identical to ``nn.Dense``.

    In the plain 'int8' turbo tier the shortcut deliberately stays bf16:
    it is bandwidth-bound, and a standalone W8A8 form was MEASURED
    SLOWER than bf16 (int8 trace: 169 ms of f32 partial-product dots +
    ~60 ms of raw-piece quantize passes vs 116 ms for the whole bf16
    form). The 'int8x' tier removes exactly those two taxes: ``qx`` is
    the block's SHARED s8 input view (no standalone quantize pass) and
    the partials cross HBM in bf16 with folded scales (ops/quant.py
    int8_shortcut) — the pieces then read at 1 byte/elem.

    ``residual``: when given, returns ``residual + x @ kernel + bias``.
    With INFODIFF_ENABLE_FUSED_SHORTCUT=1 this runs as ONE Pallas pass
    (opt-in: measured behind XLA end-to-end, see shortcut_fused.py for
    the fusion-boundary analysis)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, residual=None, qx=None) -> jnp.ndarray:
        kernel = self.param(
            "kernel", DEFAULT_KERNEL, (x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param("bias", zeros, (self.features,), jnp.float32)
        if qx is not None and not self.is_initializing():
            return q8.int8_shortcut(qx, kernel, bias, self.dtype, residual)
        if not self.is_initializing():
            fused = _try_fused_shortcut(residual, [x], kernel, bias)
            if fused is not None:
                return fused
        (kernel, bias, x) = nn.dtypes.promote_dtype(
            kernel, bias, x, dtype=self.dtype
        )
        out = x @ kernel + bias
        return out if residual is None else residual + out


def _as_pieces(x):
    """Blocks accept ``x`` as one array or a tuple of not-yet-concatenated
    pieces (the UNet skip-concat). Returns (pieces-or-None, in_ch). When
    pieces are given the whole block runs CONCAT-FREE: GN stats come from
    per-piece sums (fused into each piece's producer), normalization is
    per piece, and conv1/shortcut distribute over the channel concat with
    sliced kernels — the concatenated tensor never hits HBM."""
    if isinstance(x, (tuple, list)):
        return list(x), sum(p.shape[-1] for p in x)
    return None, x.shape[-1]


class _PieceConv3(nn.Module):
    """3x3 conv over ``concat(pieces, -1)`` computed as a sum of per-piece
    convs with input-channel-sliced kernels — exact same math (conv is
    linear in input channels; f32/bf16 reassociation only) and the exact
    same param tree as ``nn.Conv`` (kernel [3,3,Cin,Cout] + bias), so
    checkpoints are interchangeable with the concat form."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pieces):
        chain = pieces if isinstance(pieces, _AffineChain) else None
        if chain is not None:
            pieces = list(chain.pieces)
        cin = sum(p.shape[-1] for p in pieces)
        kernel = self.param(
            "kernel", DEFAULT_KERNEL, (3, 3, cin, self.features), jnp.float32
        )
        bias = self.param("bias", zeros, (self.features,), jnp.float32)
        if chain is not None:
            if (self.has_variable("quant", "act_absmax")
                    and not self.is_mutable_collection("quant")):
                from infodiffusion_tpu.ops.pallas.qconv import qconv_fused

                absmax = self.variable("quant", "act_absmax").value
                return qconv_fused(
                    pieces, chain.A, chain.B, absmax.reshape(-1),
                    kernel, bias, self.dtype,
                    interpret=_qconv_interpret(),
                )
            pieces = _materialize_chain(chain, self.dtype)
        if self.is_mutable_collection("quant") and not self.is_initializing():
            q8.observe_absmax(self, pieces)
        elif self.has_variable("quant", "act_absmax"):
            # int8 tier: per-PIECE act scales folded into the kernel's
            # input-channel slices (quant.py quantize_pieces_folded), so
            # the per-piece conv partials are directly summable and
            # dequantize ONCE. The running partial between piece convs
            # crosses HBM in bf16 instead of raw s32 — half the spill
            # bytes (134 -> 67 MB per level-0 upblock step at the
            # flagship shape); the ~2^-9 relative rounding on the
            # partial is far below the int8 noise floor itself.
            absmax = self.variable("quant", "act_absmax").value
            xqs, kq, sw = q8.quantize_pieces_folded(pieces, absmax, kernel)
            acc = None
            o = 0
            for i, xq in enumerate(xqs):
                c = pieces[i].shape[-1]
                y = q8.int8_conv(
                    xq, kq[:, :, o : o + c, :], (1, 1), ((1, 1), (1, 1))
                ).astype(jnp.float32)
                acc = y if acc is None else acc + y
                if i < len(xqs) - 1:
                    acc = acc.astype(jnp.bfloat16).astype(jnp.float32)
                o += c
            return (acc * sw + bias.astype(jnp.float32)).astype(self.dtype)
        (kernel, bias, *pieces) = nn.dtypes.promote_dtype(
            kernel, bias, *pieces, dtype=self.dtype
        )
        out = None
        o = 0
        for p in pieces:
            c = p.shape[-1]
            y = jax.lax.conv_general_dilated(
                p,
                kernel[:, :, o : o + c, :],
                window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            out = y if out is None else out + y
            o += c
        return out + bias


class _PieceDense(nn.Module):
    """Dense over ``concat(pieces, -1)`` as a sum of per-piece matmuls
    with row-sliced kernels; param tree identical to ``nn.Dense``.
    bf16 in the plain 'int8' turbo tier; s8 reads from the block's
    shared input view under 'int8x' (see :class:`ShortcutDense`).

    ``residual``: when given, returns ``residual + dense(pieces)``;
    with INFODIFF_ENABLE_FUSED_SHORTCUT=1 as ONE opt-in Pallas pass
    over all pieces (see shortcut_fused.py)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pieces, residual=None, qx=None):
        cin = sum(p.shape[-1] for p in pieces)
        kernel = self.param(
            "kernel", DEFAULT_KERNEL, (cin, self.features), jnp.float32
        )
        bias = self.param("bias", zeros, (self.features,), jnp.float32)
        if qx is not None and not self.is_initializing():
            return q8.int8_shortcut(qx, kernel, bias, self.dtype, residual)
        if not self.is_initializing():
            fused = _try_fused_shortcut(residual, pieces, kernel, bias)
            if fused is not None:
                return fused
        (kernel, bias, *pieces) = nn.dtypes.promote_dtype(
            kernel, bias, *pieces, dtype=self.dtype
        )
        out = None
        o = 0
        for p in pieces:
            c = p.shape[-1]
            y = p @ kernel[o : o + c, :]
            out = y if out is None else out + y
            o += c
        out = out + bias
        return out if residual is None else residual + out


class _GNParams(nn.Module):
    """Bare GroupNorm scale/bias params; the math lives in ops.norm so the
    FiLM-fused variant can reuse the same parameters. Given a tuple of
    pieces (norm1 under a skip-concat) it returns normalized PIECES
    (ops.norm.group_norm_pieces) so the concat never materializes.

    ``fused_out_ch`` marks this norm as feeding a quantized ResBlock conv
    (the blocks pass their out_ch). Under int8 turbo calibration the site
    records a 'quant'/'fused_qconv' marker; at apply time, when that
    marker is present and the fused quantize-conv kernel is active
    (ops/pallas/qconv.py use_fused_qconv), the call returns an
    :class:`_AffineChain` instead of normalized activations — only the
    per-(batch, group) stats run in XLA, and the GN-apply/FiLM/SiLU/
    quantize chain moves into the conv kernel's registers, erasing the
    turbo tier's standalone quantize passes (24.4% of the round-2 trace,
    BASELINE.md item 5). The kernel MEASURED SLOWER end-to-end (38 vs
    100 samples/s — its in-register chain costs more than the erased
    passes; dossier in the qconv module docstring), so use_fused_qconv
    is opt-in and the default apply materializes the chain back into
    the plain XLA int8 path."""

    fused_out_ch: Optional[int] = None

    @nn.compact
    def __call__(self, x, films=(), deterministic: bool = True):
        plist = list(x) if isinstance(x, (tuple, list)) else [x]
        C = sum(p.shape[-1] for p in plist)
        scale = self.param("scale", nn.initializers.ones_init(), (C,), jnp.float32)
        bias = self.param("bias", zeros, (C,), jnp.float32)
        if self.fused_out_ch is not None and not self.is_initializing():
            from infodiffusion_tpu.ops.pallas.qconv import (
                fused_qconv_supported,
                use_fused_qconv,
            )

            shapes = [p.shape for p in plist]
            if (q8.calib_mode() == "int8"
                    and self.is_mutable_collection("quant")):
                in_bytes = max(p.dtype.itemsize for p in plist)
                if fused_qconv_supported(shapes, self.fused_out_ch, in_bytes):
                    self.variable(
                        "quant", "fused_qconv",
                        lambda: jnp.ones((), jnp.float32),
                    )
            elif (self.has_variable("quant", "fused_qconv")
                  and deterministic
                  and use_fused_qconv()
                  and fused_qconv_supported(
                      shapes, self.fused_out_ch,
                      max(p.dtype.itemsize for p in plist))):
                A, Brow = group_norm_affine(x, _GROUPS, scale, bias, films)
                return _AffineChain(tuple(plist), A, Brow)
        if isinstance(x, (tuple, list)) and not films:
            return gn_pieces_op(x, _GROUPS, scale, bias)
        if films:
            return adagn(x, _GROUPS, scale, bias, films)
        return gn_op(x, _GROUPS, scale, bias)


class _XQuant(nn.Module):
    """int8x tier: one per-block s8 view of the raw block input, SHARED
    by the norm1 chain and the 1x1 shortcut so the residual stream's
    reads cost 1 byte/elem instead of 2 (the bf16 carry itself — the
    residual ADD chain — stays bf16, so the quantization error is
    bounded per block rather than compounding along the stream).

    Calibration (ops/quant.py calibrate(mode='int8x')) observes the
    input range here; at apply time the presence of the x_absmax
    variable is what switches the block to the aggressive tier, keeping
    the jit cache key honest. Returns ``(qx_list, scales)`` or ``None``
    (plain int8 / turbo off)."""

    @nn.compact
    def __call__(self, pieces):
        if (q8.calib_mode() == "int8x"
                and self.is_mutable_collection("quant")
                and not self.is_initializing()):
            # calibration runs the float forward; only observe here
            q8.observe_absmax(self, pieces, name="x_absmax")
        elif self.has_variable("quant", "x_absmax"):
            absmax = self.variable("quant", "x_absmax").value
            return q8.quantize_x_pieces(pieces, absmax)
        return None


def _stage1(x, out_ch, dtype, deterministic=True):
    """norm1 -> SiLU -> conv1, shared by every ResBlock variant; runs
    concat-free when ``x`` is a tuple of skip-concat pieces. Called from
    inside a compact ``__call__`` so submodules attach to the caller.
    Returns (h, pieces_or_None, in_ch, xq) — ``xq`` is the int8x shared
    s8 input view (None outside that tier), which norm1 reads here and
    ``_residual_add`` reuses for the shortcut. Under int8 turbo the norm
    may hand the conv an :class:`_AffineChain` (fused quantize-conv
    kernel path)."""
    pieces, in_ch = _as_pieces(x)
    plist = pieces if pieces is not None else [x]
    xq = _XQuant(name="xq")(plist)
    if xq is not None:
        qs, s = xq
        deq = [q.astype(jnp.float32) * s[i] for i, q in enumerate(qs)]
        norm_in = deq if pieces is not None else deq[0]
    else:
        norm_in = pieces if pieces is not None else x
    h = _GNParams(name="norm1", fused_out_ch=out_ch)(
        norm_in, deterministic=deterministic
    )
    if isinstance(h, _AffineChain):
        conv_cls = _PieceConv3 if pieces is not None else Conv3
        h = conv_cls(out_ch, dtype, name="conv1")(h)
    elif pieces is not None:
        h = _PieceConv3(out_ch, dtype, name="conv1")([nn.silu(p) for p in h])
    else:
        h = _conv3(out_ch, dtype, "conv1")(nn.silu(h))
    return h, pieces, in_ch, xq


def _residual_add(h, x, pieces, in_ch, out_ch, dtype, xq=None):
    """The block epilogue ``h + shortcut(x)``: 1x1 projection on channel
    change (as a sum of per-piece matmuls when concat-free; from the
    shared s8 input view in the int8x tier; one opt-in Pallas pass with
    INFODIFF_ENABLE_FUSED_SHORTCUT=1 — shortcut_fused.py), identity
    otherwise."""
    if in_ch != out_ch:
        if pieces is not None:
            return _PieceDense(out_ch, dtype, name="shortcut")(
                pieces, residual=h, qx=xq
            )
        return ShortcutDense(out_ch, dtype, name="shortcut")(
            x, residual=h, qx=xq
        )
    if pieces is not None:
        return h + jnp.concatenate(pieces, axis=-1)
    return h + x


def _stage_n(h, films, out_ch, dropout, dtype, deterministic, norm_name,
             conv_name):
    """norm{2,3} -> SiLU -> dropout -> conv, shared by the conditioned
    ResBlock stages. Under int8 turbo the norm may return an
    :class:`_AffineChain`, in which case SiLU/quantize run inside the
    fused conv kernel and the (deterministic) dropout is an identity —
    chains are only produced when ``deterministic`` is True."""
    h = _GNParams(name=norm_name, fused_out_ch=out_ch)(
        h, films=films, deterministic=deterministic
    )
    if isinstance(h, _AffineChain):
        return Conv3(out_ch, dtype, name=conv_name)(h)
    h = nn.silu(h)
    h = nn.Dropout(dropout)(h, deterministic=deterministic)
    return _conv3(out_ch, dtype, conv_name)(h)


def _film_proj(tdim_in, out_ch, dtype, name):
    """SiLU -> Linear(tdim -> 2*out_ch), split to (scale, shift)
    (reference: modules.py:209-211, 269-275)."""
    return nn.Dense(
        2 * out_ch, kernel_init=DEFAULT_KERNEL, bias_init=zeros,
        dtype=dtype, name=name,
    )


class ResBlock(nn.Module):
    """Time-conditioned ResBlock (reference: modules.py:206-258)."""

    out_ch: int
    dropout: float = 0.1
    attn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, temb: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        from infodiffusion_tpu.nn.attention import AttnBlock

        h, pieces, in_ch, xq = _stage1(x, self.out_ch, self.dtype,
                                       deterministic)

        t = _film_proj(temb.shape[-1], self.out_ch, self.dtype, "temb_proj")(
            nn.silu(temb)
        )
        t_scale, t_shift = jnp.split(t, 2, axis=-1)
        h = _stage_n(h, [(t_scale, t_shift)], self.out_ch, self.dropout,
                     self.dtype, deterministic, "norm2", "conv2")
        h = _stage_n(h, [], self.out_ch, self.dropout, self.dtype,
                     deterministic, "norm3", "conv3")

        h = _residual_add(h, x, pieces, in_ch, self.out_ch, self.dtype,
                          xq=xq)
        if self.attn:
            h = AttnBlock(dtype=self.dtype, name="attn")(h)
        return h


class AuxResBlock(nn.Module):
    """ResBlock with dual FiLM: time then aux latent
    (reference: modules.py:261-328)."""

    out_ch: int
    dropout: float = 0.1
    attn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        temb: jnp.ndarray,
        aemb: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        from infodiffusion_tpu.nn.attention import AttnBlock

        h, pieces, in_ch, xq = _stage1(x, self.out_ch, self.dtype,
                                       deterministic)

        t = _film_proj(temb.shape[-1], self.out_ch, self.dtype, "temb_proj")(
            nn.silu(temb)
        )
        a = _film_proj(aemb.shape[-1], self.out_ch, self.dtype, "aemb_proj")(
            nn.silu(aemb)
        )
        t_scale, t_shift = jnp.split(t, 2, axis=-1)
        a_scale, a_shift = jnp.split(a, 2, axis=-1)
        # fused GN + dual FiLM (reference applies time FiLM then aux FiLM
        # back-to-back on the same normalized activations; modules.py:312-318)
        h = _stage_n(h, [(t_scale, t_shift), (a_scale, a_shift)],
                     self.out_ch, self.dropout, self.dtype, deterministic,
                     "norm2", "conv2")
        h = _stage_n(h, [], self.out_ch, self.dropout, self.dtype,
                     deterministic, "norm3", "conv3")

        h = _residual_add(h, x, pieces, in_ch, self.out_ch, self.dtype,
                          xq=xq)
        if self.attn:
            h = AttnBlock(dtype=self.dtype, name="attn")(h)
        return h


class EncoderResBlock(nn.Module):
    """Unconditioned 2-stage ResBlock used by Encoder/Decoder
    (reference: modules.py:331-366, named ResBlock_encoder there)."""

    out_ch: int
    dropout: float = 0.1
    attn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        from infodiffusion_tpu.nn.attention import AttnBlock

        h, pieces, in_ch, xq = _stage1(x, self.out_ch, self.dtype,
                                       deterministic)

        h = _stage_n(h, [], self.out_ch, self.dropout, self.dtype,
                     deterministic, "norm2", "conv2")

        h = _residual_add(h, x, pieces, in_ch, self.out_ch, self.dtype,
                          xq=xq)
        if self.attn:
            h = AttnBlock(dtype=self.dtype, name="attn")(h)
        return h


class DownSample(nn.Module):
    """Stride-2 3x3 conv (reference: modules.py:63-75)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return _conv3(x.shape[-1], self.dtype, "conv", strides=2)(x)


class _SubpixelUpConv(nn.Module):
    """``nearest x2 then conv3x3`` computed WITHOUT materializing the
    4x-size upsampled tensor: each of the four output phases (di, dj)
    reads a 2x2 window of the ORIGINAL tensor, with a 2x2 kernel whose
    entries are sums of the 3x3 kernel's rows/columns that collapse onto
    the same source pixel under nearest-neighbor duplication. Exactly the
    same math (kernel-entry re-association only), 4 taps instead of 9
    (2.25x fewer FLOPs), and no 4x HBM round-trip. Param tree identical
    to the ``nn.Conv`` it replaces (kernel [3,3,C,C] + bias)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        B, H, W, C = x.shape
        kernel = self.param(
            "kernel", DEFAULT_KERNEL, (3, 3, C, self.features), jnp.float32
        )
        bias = self.param("bias", zeros, (self.features,), jnp.float32)
        (kernel, bias, x) = nn.dtypes.promote_dtype(
            kernel, bias, x, dtype=self.dtype
        )
        # Row collapse: phase di=0 reads source rows (i-1, i) with weights
        # (W[0], W[1]+W[2]); di=1 reads (i, i+1) with (W[0]+W[1], W[2]).
        # Columns are analogous. Padding puts the out-of-range source
        # pixel at zero, matching the zero padding of the upsampled conv.
        rows = {
            0: (jnp.stack([kernel[0], kernel[1] + kernel[2]]), (1, 0)),
            1: (jnp.stack([kernel[0] + kernel[1], kernel[2]]), (0, 1)),
        }
        phases = []
        for di in (0, 1):
            kr, pad_r = rows[di]
            cols = {
                0: (jnp.stack([kr[:, 0], kr[:, 1] + kr[:, 2]], axis=1), (1, 0)),
                1: (jnp.stack([kr[:, 0] + kr[:, 1], kr[:, 2]], axis=1), (0, 1)),
            }
            prow = []
            for dj in (0, 1):
                kc, pad_c = cols[dj]
                prow.append(
                    jax.lax.conv_general_dilated(
                        x, kc, (1, 1), (pad_r, pad_c),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                )
            phases.append(jnp.stack(prow, axis=3))  # [B,H,W,2,F]
        y = jnp.stack(phases, axis=2)  # [B,H,2,W,2,F]
        return y.reshape(B, 2 * H, 2 * W, self.features) + bias


class UpSample(nn.Module):
    """Nearest x2 then 3x3 conv (reference: modules.py:78-93).

    ``INFODIFF_SUBPIXEL_UPSAMPLE=1`` opts into the subpixel-decomposed
    form (same params, same math, 2.25x fewer FLOPs — see
    :class:`_SubpixelUpConv`). MEASURED SLOWER on v5e (78.7 vs 79.7
    DDIM-100 samples/s): XLA maps the one big conv over the materialized
    upsampled tensor better than four small-kernel convs + interleave,
    so the literal form stays the default."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import os

        B, H, W, C = x.shape
        if os.environ.get("INFODIFF_SUBPIXEL_UPSAMPLE") == "1":
            return _SubpixelUpConv(C, self.dtype, name="conv")(x)
        # nearest-x2 fused into the conv module (in turbo mode the input
        # quantizes BEFORE the repeat — see Conv3.repeat)
        return _conv3(C, self.dtype, "conv", repeat=2)(x)


class LatentDownSample(nn.Module):
    """1-D stride-2 conv variant — defined-but-unused in the reference;
    kept for inventory parity (reference: modules.py:96-108)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, L, C]
        return nn.Conv(
            x.shape[-1], (3,), strides=(2,), padding=((1, 1),),
            kernel_init=DEFAULT_KERNEL, bias_init=zeros, dtype=self.dtype,
            name="conv",
        )(x)


class LatentUpSample(nn.Module):
    """1-D nearest x2 + conv variant — defined-but-unused in the reference
    (reference: modules.py:111-126)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.repeat(x, 2, axis=1)
        return nn.Conv(
            x.shape[-1], (3,), strides=(1,), padding=((1, 1),),
            kernel_init=DEFAULT_KERNEL, bias_init=zeros, dtype=self.dtype,
            name="conv",
        )(x)


class MLPLNAct(nn.Module):
    """Linear -> [x * (bias + cond)] -> LayerNorm -> act -> dropout
    (reference: models.py:91-163). ``condition_bias`` is 1 everywhere the
    reference instantiates it (models.py:219)."""

    out_ch: int
    norm: bool
    use_cond: bool
    activation: Optional[str] = None  # None or 'silu' in practice
    condition_bias: float = 0.0
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        cond: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        # torch kaiming-normal for 'silu'/'relu' activations, default
        # init otherwise (reference: models.py:128-145). Flax's default is
        # lecun_normal; we match the reference's explicit cases.
        from infodiffusion_tpu.nn.initializers import kaiming_normal_relu

        kinit = (
            kaiming_normal_relu()
            if self.activation in ("relu", "silu", "leaky_relu")
            else nn.initializers.lecun_normal()
        )
        x = nn.Dense(
            self.out_ch, kernel_init=kinit, bias_init=zeros,
            dtype=self.dtype, name="linear",
        )(x)
        if self.use_cond:
            assert cond is not None
            c = nn.silu(cond) if self.activation is not None else cond
            c = nn.Dense(
                self.out_ch, kernel_init=kinit, bias_init=zeros,
                dtype=self.dtype, name="linear_emb",
            )(c)
            x = x * (self.condition_bias + c)
        if self.norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(
                x.astype(jnp.float32)
            ).astype(self.dtype)
        if self.activation is not None:
            x = nn.silu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x
