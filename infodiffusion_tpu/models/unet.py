"""UNet backbones, Encoder and Decoder (reference: models.py:7-603).

One shared skeleton (``_UNetSkeleton``) reproduces the reference's exact
channel bookkeeping — per-level ``num_res_blocks`` down blocks with a
skip pushed after each, a skip after each DownSample, two middle blocks
(attn on the first), ``num_res_blocks + 1`` up blocks each popping a
skip, attention at levels listed in ``attn`` — parameterized by where
aux conditioning applies:

- ``UNet``            : temb only                 (reference: models.py:7-88)
- ``AuxiliaryUNet``   : temb+aemb everywhere      (reference: models.py:237-326)
- ``BottleneckAuxUNet``: temb everywhere, aemb in the 2 middle blocks
                         only                     (reference: models.py:329-421)
- ``Encoder``/``Decoder``: unconditioned blocks   (reference: models.py:424-603)

All NHWC; shapes are given as the reference's (C, H, W) tuples in
configs and converted at the call boundary.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from infodiffusion_tpu.nn.blocks import (
    AuxResBlock,
    DownSample,
    EncoderResBlock,
    ResBlock,
    UpSample,
    _conv3,
    _GNParams,
)
from infodiffusion_tpu.nn.embeddings import TimeEmbedding
from infodiffusion_tpu.nn.initializers import (
    DEFAULT_KERNEL,
    TAIL_KERNEL,
    kaiming_normal_relu,
    zeros,
)


class _UNetSkeleton(nn.Module):
    """Shared down/middle/up skeleton. ``aux_mode`` selects the block type
    per position: 'none' | 'all' | 'bottleneck' | 'encoder'."""

    ch: int
    ch_mult: Tuple[int, ...]
    out_ch: int
    aux_mode: str = "none"
    attn: Tuple[int, ...] = (2,)
    num_res_blocks: int = 2
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        temb: Optional[jnp.ndarray] = None,
        aemb: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        assert all(i < len(self.ch_mult) for i in self.attn), "attn index OOB"
        det = deterministic
        n = [0]  # running index for unique, order-stable module names

        # INFODIFF_REMAT=1 wraps each ResBlock in jax.checkpoint: the
        # backward recomputes block activations instead of reading them
        # back from HBM — a throughput EXPERIMENT knob (the train
        # backward is ~38% HBM-bound per the xprof attribution), not a
        # memory necessity at this model scale.
        import os

        remat = os.environ.get("INFODIFF_REMAT") == "1"

        def _cls(c, det_argnum):
            # deterministic is passed positionally and marked static so
            # jax.checkpoint doesn't try to trace the Python bool
            return nn.remat(c, static_argnums=(det_argnum,)) if remat else c

        def block(h, out_c, use_attn, kind):
            name = f"{kind}block_{n[0]}"
            n[0] += 1
            if kind in ("down", "up", "middle"):
                mode = self.aux_mode
                if mode == "encoder":
                    return _cls(EncoderResBlock, 2)(
                        out_c, self.dropout, use_attn, self.dtype, name=name
                    )(h, det)
                aux_here = mode == "all" or (mode == "bottleneck" and kind == "middle")
                if aux_here:
                    return _cls(AuxResBlock, 4)(
                        out_c, self.dropout, use_attn, self.dtype, name=name
                    )(h, temb, aemb, det)
                return _cls(ResBlock, 3)(
                    out_c, self.dropout, use_attn, self.dtype, name=name
                )(h, temb, det)
            raise ValueError(kind)

        # head/tail convs stay on the normal dtype policy in turbo mode
        # (tiny FLOPs, quality-critical image boundary — ops/quant.py)
        h = _conv3(self.ch, self.dtype, "head", quantize=False)(x)
        hs = [h]
        now_ch = self.ch
        # --- down path (reference: models.py:16-29) ---
        for i, mult in enumerate(self.ch_mult):
            out_c = self.ch * mult
            for _ in range(self.num_res_blocks):
                h = block(h, out_c, i in self.attn, "down")
                now_ch = out_c
                hs.append(h)
            if i != len(self.ch_mult) - 1:
                h = DownSample(self.dtype, name=f"down_{i}")(h)
                hs.append(h)
        # --- middle (reference: models.py:31-34) ---
        h = block(h, now_ch, True, "middle")
        h = block(h, now_ch, False, "middle")
        # --- up path (reference: models.py:36-46) ---
        for i, mult in reversed(list(enumerate(self.ch_mult))):
            out_c = self.ch * mult
            for _ in range(self.num_res_blocks + 1):
                # skip-concat passed as PIECES: the block concatenates for
                # conv/shortcut, but computes norm1's GN stats per piece so
                # XLA fuses them into each piece's producer instead of a
                # standalone HBM pass over the concat (ops/norm.py,
                # STATUS.md roofline attribution)
                h = block((h, hs.pop()), out_c, i in self.attn, "up")
                now_ch = out_c
            if i != 0:
                h = UpSample(self.dtype, name=f"up_{i}")(h)
        assert not hs
        # --- tail: GN-SiLU-conv, xavier gain 1e-5 (reference: models.py:48-59) ---
        h = _GNParams(name="tail_norm")(h)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=TAIL_KERNEL, bias_init=zeros, dtype=self.dtype,
            name="tail_conv",
        )(h)
        return h


class UNet(nn.Module):
    """Vanilla DDPM UNet (reference: models.py:7-88)."""

    T: int
    ch: int = 64
    ch_mult: Tuple[int, ...] = (1, 2, 4, 8)
    attn: Tuple[int, ...] = (2,)
    num_res_blocks: int = 2
    dropout: float = 0.1
    out_ch: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, *, deterministic: bool = True):
        tdim = self.ch * 4
        temb = TimeEmbedding(
            self.T, self.ch, tdim, self.dtype, name="time_embedding"
        )(t)
        return _UNetSkeleton(
            self.ch, self.ch_mult, self.out_ch, "none", self.attn,
            self.num_res_blocks, self.dropout, self.dtype, name="unet",
        )(x, temb, deterministic=deterministic)


class AuxiliaryUNet(nn.Module):
    """UNet fully conditioned on the aux latent ``a``
    (reference: models.py:237-326)."""

    T: int
    a_dim: int
    ch: int = 64
    ch_mult: Tuple[int, ...] = (1, 2, 4, 8)
    attn: Tuple[int, ...] = (2,)
    num_res_blocks: int = 2
    dropout: float = 0.1
    out_ch: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, a, *, deterministic: bool = True):
        tdim = self.ch * 4
        temb = TimeEmbedding(
            self.T, self.ch, tdim, self.dtype, name="time_embedding"
        )(t)
        aemb = nn.Dense(
            tdim, kernel_init=DEFAULT_KERNEL, bias_init=zeros,
            dtype=self.dtype, name="fc_a",
        )(a)
        return _UNetSkeleton(
            self.ch, self.ch_mult, self.out_ch, "all", self.attn,
            self.num_res_blocks, self.dropout, self.dtype, name="unet",
        )(x, temb, aemb, deterministic=deterministic)


class BottleneckAuxUNet(nn.Module):
    """Aux conditioning only in the two middle blocks; fc_a = SiLU->Linear
    with Kaiming init (reference: models.py:329-421, esp. 336-339,385-387)."""

    T: int
    a_dim: int
    ch: int = 64
    ch_mult: Tuple[int, ...] = (1, 2, 4, 8)
    attn: Tuple[int, ...] = (2,)
    num_res_blocks: int = 2
    dropout: float = 0.1
    out_ch: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, a, *, deterministic: bool = True):
        tdim = self.ch * 4
        temb = TimeEmbedding(
            self.T, self.ch, tdim, self.dtype, name="time_embedding"
        )(t)
        aemb = nn.Dense(
            tdim, kernel_init=kaiming_normal_relu(), bias_init=zeros,
            dtype=self.dtype, name="fc_a",
        )(nn.silu(a))
        return _UNetSkeleton(
            self.ch, self.ch_mult, self.out_ch, "bottleneck", self.attn,
            self.num_res_blocks, self.dropout, self.dtype, name="unet",
        )(x, temb, aemb, deterministic=deterministic)


class Encoder(nn.Module):
    """Full-UNet encoder -> 1ch tail -> flatten -> fc_a -> (mu, log_var),
    with the reparametrized draw done *inside* forward like the reference
    (reference: models.py:424-518). Returns (a, a_q, mu, log_var); the
    deterministic ``a`` is the pre-mu projection (models.py:512-515).

    Needs an 'reparam' RNG stream when ``sample=True``.
    """

    a_dim: int
    shape: Tuple[int, int, int]  # (C, H, W), reference convention
    ch: int = 64
    ch_mult: Tuple[int, ...] = (1, 2, 4, 8, 8)
    attn: Tuple[int, ...] = (2,)
    num_res_blocks: int = 2
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, sample: bool = True,
                 reparam_eps=None):
        h = _UNetSkeleton(
            self.ch, self.ch_mult, 1, "encoder", self.attn,
            self.num_res_blocks, self.dropout, self.dtype, name="unet",
        )(x, deterministic=deterministic)
        h = h.reshape(h.shape[0], -1)  # [B, H*W] (tail emits 1 channel)
        dense = lambda n, d: nn.Dense(
            d, kernel_init=DEFAULT_KERNEL, bias_init=zeros,
            dtype=self.dtype, name=n,
        )
        a = dense("fc_a", self.a_dim)(h)
        mu = dense("fc_mu", self.a_dim)(a)
        log_var = dense("fc_var", self.a_dim)(a)
        if sample:
            # reparam_eps: optional injected standard-normal draw (parity
            # tests / deterministic debugging); default draws from the
            # 'reparam' RNG stream
            if reparam_eps is None:
                import jax.random as jr

                key = self.make_rng("reparam")
                reparam_eps = jr.normal(key, mu.shape, dtype=mu.dtype)
            a_q = mu + reparam_eps.astype(mu.dtype) * jnp.exp(0.5 * log_var)
        else:
            a_q = mu
        return a, a_q, mu, log_var


class Decoder(nn.Module):
    """fc_a a_dim -> C*H*W, reshape, UNet-shaped decode to an image
    (reference: models.py:521-603)."""

    a_dim: int
    shape: Tuple[int, int, int]  # (C, H, W)
    ch: int = 64
    ch_mult: Tuple[int, ...] = (1, 2, 4, 8)
    attn: Tuple[int, ...] = (2,)
    num_res_blocks: int = 2
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a, *, deterministic: bool = True):
        C, H, W = self.shape
        h = nn.Dense(
            C * H * W, kernel_init=nn.initializers.lecun_normal(),
            bias_init=zeros, dtype=self.dtype, name="fc_a",
        )(a)
        # reference reshapes to NCHW (models.py:579); NHWC here — the
        # permutation is absorbed by the learned fc_a.
        h = h.reshape(a.shape[0], H, W, C)
        return _UNetSkeleton(
            self.ch, self.ch_mult, C, "encoder", self.attn,
            self.num_res_blocks, self.dropout, self.dtype, name="unet",
        )(h, deterministic=deterministic)
