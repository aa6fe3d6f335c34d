"""int8 "turbo" inference tier: W8A8 conv/matmul on the MXU.

The reference has no quantized path at all (eager fp32 torch end to end);
this is a beyond-parity TPU capability. The v5e MXU runs int8 at ~2x the
bf16 macs/cycle: measured through plain XLA at the flagship sampler's
dominant conv shape (b128 32x32x128), int8 sustains ~1.55x bf16
(187 vs 120 TOP/s fetch-synced), and 1.77x on square matmul.

Scheme (standard post-training W8A8, symmetric):

- weights: per-output-channel symmetric int8, quantized inline from the
  f32 params each apply (an O(params) elementwise op, negligible next to
  the convs; no separate packed-params tree, so checkpoints are
  untouched).
- activations: per-tensor symmetric int8 with STATIC scales calibrated
  once per sampler construction (one jitted forward over a batch that
  spans the timestep grid, ``mutable=['quant']``). Static scales let XLA
  fuse the quantize into the producer fusion (GN/SiLU writes int8
  directly — the conv then reads HALF the bytes of the bf16 path) and
  the dequantize into the conv epilogue. Out-of-range activations
  saturate, which int8 tolerates by construction.
- accumulation int32 on the MXU; dequant + bias in f32; schedule math,
  GroupNorm statistics and softmax stay f32 (CLAUDE.md policy) — only
  the conv bodies drop to int8. The 1x1 shortcut projections stay bf16
  on purpose: they are bandwidth-bound, and the W8A8 form measured
  SLOWER there (the standalone quantize pass plus f32 partial-product
  dots cost more HBM bytes than the int8 reads save — int8 trace:
  ~230 ms vs 116 ms bf16; see nn/blocks.py ShortcutDense).

Activation: ``INFODIFF_TURBO=int8`` (or ``--turbo int8``) at sampler
construction; the samplers then calibrate and thread a ``'quant'``
variable collection through ``model.apply``. Modules quantize exactly
when that collection is present, so the jit cache key (the params
pytree structure) distinguishes turbo from normal traces automatically
and the training path is untouched.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import jax.random as jr
from jax import lax

_EPS = 1e-30

#: valid turbo tiers. 'int8' = conv bodies W8A8, residual stream and
#: shortcuts bf16 (near-pixel parity). 'int8x' = int8 PLUS the residual
#: stream's *reads* go through a per-block s8 copy: norm1 and the 1x1
#: shortcut projections consume the block input at 1 byte/elem instead
#: of 2 (the bf16 carry itself — the add chain — stays bf16, so
#: precision loss is bounded per block, not compounding).
#:
#: int8x MEASURED SLOWER than int8 on the flagship DDIM-100 sampler
#: (94.0 vs 100.1 samples/s, v5e): XLA does emit the s8 x-copies for
#: free in the producer conv epilogues, but s8-reading ELEMENTWISE
#: passes run at roughly half the VPU bandwidth of bf16 ones (the
#: dequant-GN-SiLU-requantize fusions measured 380-390 GB/s vs the
#: bf16 forms' 600-1040), so halving the bytes does not halve the
#: time, and extra s8->bf16 convert passes appear at the piece-conv
#: boundaries. Kept as an opt-in documented negative result — the
#: byte-arithmetic was right, the VPU int8 throughput assumption was
#: not.
MODES = ("int8", "int8x")

_calib_mode = ""


def calib_mode() -> str:
    """The tier currently being CALIBRATED ('' outside calibration).
    Blocks consult this at trace time to decide which observation sites
    to create — at apply time behavior is keyed purely on which
    variables exist in the 'quant' collection (jit-cache safe)."""
    return _calib_mode


def turbo_mode() -> str:
    """'' (off) or a MODES entry — the INFODIFF_TURBO env default used
    by the samplers when no explicit ``turbo=`` argument is given."""
    return os.environ.get("INFODIFF_TURBO", "")


def quantize_weight(kernel: jnp.ndarray, reduce_axes) -> tuple:
    """Symmetric per-output-channel int8: returns (q_int8, scale_f32).

    ``reduce_axes`` are the non-output axes ((0,1,2) for HWIO conv
    kernels, (0,) for [cin,cout] dense kernels); the output axis must be
    last."""
    k = kernel.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(k), axis=reduce_axes)
    scale = jnp.maximum(absmax, _EPS) / 127.0
    q = jnp.clip(jnp.round(k / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def quantize_act(x: jnp.ndarray, absmax: jnp.ndarray) -> tuple:
    """Symmetric per-tensor int8 with a static calibrated absmax scalar;
    returns (q_int8, scale_f32). Values beyond the calibrated range
    saturate."""
    scale = jnp.maximum(absmax.astype(jnp.float32), _EPS) / 127.0
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale), -127.0, 127.0
    ).astype(jnp.int8)
    return q, scale


def quantize_pieces_folded(pieces, absmax, kernel):
    """Per-piece int8 quantization for a skip-concat conv with the act
    scales FOLDED into the kernel's input-channel slices: returns
    ``(xq_list, kq, sw)`` where the piece convs' s32 partials are
    directly summable and the whole sum dequantizes once as
    ``(sum_i conv(xq_i, kq_slice_i)) * sw``.

    Algebra: with per-piece act scales s_i, ``x_i ~= s_i * q_i`` and
    ``sum_i conv(x_i, k_i) = sum_i conv(q_i, s_i * k_i)``, so scaling
    kernel slice i by s_i BEFORE the (joint, per-output-channel) weight
    quantization preserves each piece's activation precision exactly;
    only the weight rounding granularity couples across pieces
    (post-GN/SiLU pieces have near-equal ranges, so that is negligible).

    Why not one conv over a concatenated s8 tensor: measured 74.5 vs
    98.2 samples/s on the flagship sampler — the skip pieces live in
    DIFFERENT XLA layouts ({3,0,2,1} vs {0,3,2,1}), so the concat forces
    layout copies and splits the quantize chain into separate
    materialized f32 passes. Per-piece quantize fusions (each riding its
    piece's GN/SiLU producer chain) plus per-piece convs keep every pass
    at its bandwidth floor; the folded scales then let the partial sum
    spill at HALF the bytes (bf16 instead of raw s32 — see
    _PieceConv3)."""
    xqs, s = quantize_x_pieces(pieces, absmax)
    keff, o = [], 0
    for i, p in enumerate(pieces):
        c = p.shape[-1]
        keff.append(kernel[:, :, o : o + c, :].astype(jnp.float32) * s[i])
        o += c
    kq, sw = quantize_weight(jnp.concatenate(keff, axis=2), (0, 1, 2))
    return xqs, kq, sw


def int8_conv(xq, kq, strides, padding):
    """int8 x int8 -> int32 conv on the MXU (NHWC/HWIO)."""
    return lax.conv_general_dilated(
        xq, kq, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def int8_dot(xq, kq):
    """int8 x int8 -> int32 matmul on the MXU: contracts the last dim of
    ``xq`` with the first of ``kq`` (the 1x1-projection form)."""
    return lax.dot_general(
        xq, kq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def quantize_x_pieces(pieces, absmax):
    """int8x tier: symmetric per-piece s8 view of a block's raw input.
    Returns ``(qx_list, s)`` with ``pieces[i] ~= qx_list[i] * s[i]``."""
    s = jnp.maximum(absmax.astype(jnp.float32), _EPS) / 127.0
    qs = [
        jnp.clip(
            jnp.round(p.astype(jnp.float32) / s[i]), -127.0, 127.0
        ).astype(jnp.int8)
        for i, p in enumerate(pieces)
    ]
    return qs, s


def int8_shortcut(qx, kernel, bias, dtype, residual=None):
    """int8x tier 1x1 shortcut: ``residual + concat(x_pieces) @ kernel +
    bias`` computed from the block's shared s8 input view ``qx =
    (qx_list, s)`` — the same scale-folding algebra as
    :func:`quantize_pieces_folded` (per-piece act scales folded into the
    kernel's row slices before joint per-output-channel weight
    quantization), with the running partial crossing HBM in bf16."""
    qs, s = qx
    keff, o = [], 0
    for i, q in enumerate(qs):
        c = q.shape[-1]
        keff.append(kernel[o : o + c, :].astype(jnp.float32) * s[i])
        o += c
    kq, sw = quantize_weight(jnp.concatenate(keff, axis=0), (0,))
    acc, o = None, 0
    for i, q in enumerate(qs):
        c = q.shape[-1]
        y = int8_dot(q, kq[o : o + c, :]).astype(jnp.float32)
        acc = y if acc is None else acc + y
        if i < len(qs) - 1:
            acc = acc.astype(jnp.bfloat16).astype(jnp.float32)
        o += c
    out = (acc * sw + bias.astype(jnp.float32)).astype(dtype)
    return out if residual is None else residual + out


def observe_absmax(module, x_or_pieces, name="act_absmax") -> None:
    """Calibration hook: running max(|x|) per conv site, stored in the
    'quant' collection (shape () for one tensor, (n_pieces,) for a
    skip-concat piece list)."""
    if isinstance(x_or_pieces, (tuple, list)):
        cur = jnp.stack(
            [jnp.max(jnp.abs(p.astype(jnp.float32))) for p in x_or_pieces]
        )
        init = lambda: jnp.zeros((len(x_or_pieces),), jnp.float32)
    else:
        cur = jnp.max(jnp.abs(x_or_pieces.astype(jnp.float32)))
        init = lambda: jnp.zeros((), jnp.float32)
    v = module.variable("quant", name, init)
    v.value = jnp.maximum(v.value, cur)


def calibrate_encoder(model, variables, x=None, data_shape=None,
                      batch=32, seed=0, mode="int8"):
    """Encoder-only calibration for the save_latent / plot_latent /
    disentangle workhorse (reference run.py:415-443): one jitted
    deterministic ``model.encode`` forward with ``mutable=['quant']``.
    Pass ``x`` (a real data batch from the loader — runner._encode_dataset
    does) for data-conditioned scales; otherwise x ~ N(0,1) over
    ``data_shape`` (images are [-1,1]-normalized, so the unit Gaussian
    covers the input range and GroupNorm renormalizes every block).
    Returns the populated 'quant' collection to thread through the
    encode apply — conv bodies then run W8A8, and the supported GN/SiLU
    ->conv sites record fused-qconv markers like the sampler tier."""
    if mode not in MODES:
        raise ValueError(f"unknown turbo mode {mode!r} (expected {MODES})")
    if x is None:
        x = jr.normal(
            jr.PRNGKey(seed), (batch,) + tuple(data_shape), jnp.float32
        )

    @jax.jit
    def run(variables, x):
        _, q = model.apply(
            variables, x, method=type(model).encode, sample=False,
            mutable=["quant"],
        )
        return q["quant"]

    global _calib_mode
    _calib_mode = mode
    try:
        return run(variables, x)
    finally:
        _calib_mode = ""


def calibrate(model, variables, data_shape, a_dim=None, T=1000,
              batch=32, seed=0, mode="int8"):
    """One jitted calibration forward: x ~ N(0,1) with per-sample
    timesteps spanning [0, T) (DDIM trajectory states are ~unit-scale at
    every t; GroupNorm renormalizes each block, so internal ranges are
    insensitive to the exact input marginal). Returns ``variables`` with
    the populated 'quant' collection merged in — passing THAT to apply is
    what switches the conv tier to int8. ``mode='int8x'`` additionally
    observes each block's raw-input range (x_absmax sites), which
    switches the blocks to the aggressive s8-residual-read tier."""
    if mode not in MODES:
        raise ValueError(f"unknown turbo mode {mode!r} (expected {MODES})")

    @jax.jit
    def run(variables, key):
        kx, ka = jr.split(key)
        x = jr.normal(kx, (batch,) + tuple(data_shape), jnp.float32)
        t = jnp.linspace(0.0, T - 1, batch).astype(jnp.int32)
        args = (x, t)
        if a_dim is not None:
            args = args + (jr.normal(ka, (batch, a_dim), jnp.float32),)
        _, q = model.apply(variables, *args, mutable=["quant"])
        return q["quant"]

    global _calib_mode
    _calib_mode = mode
    try:
        # the mode flag is read at TRACE time (inside this call)
        q = run(variables, jr.PRNGKey(seed))
    finally:
        _calib_mode = ""
    return {**variables, "quant": q}
