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

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from infodiffusion_tpu.nn.initializers import DEFAULT_KERNEL, zeros
from infodiffusion_tpu.ops import adagn
from infodiffusion_tpu.ops.norm import group_norm as gn_op

_GROUPS = 32


def _conv3(features: int, dtype, name: str, strides: int = 1) -> nn.Conv:
    # torch Conv2d(k=3, stride=s, padding=1) — explicit symmetric padding,
    # not 'SAME' (asymmetric for stride 2), for exact spatial parity.
    return nn.Conv(
        features, (3, 3), strides=(strides, strides),
        padding=((1, 1), (1, 1)),
        kernel_init=DEFAULT_KERNEL, bias_init=zeros, dtype=dtype, name=name,
    )


def _norm1_input(x):
    """Blocks accept ``x`` as one array or a tuple of not-yet-concatenated
    pieces (the UNet skip-concat). Returns (norm_input, x_concat): the
    norm gets the pieces so GN stats fuse into each piece's producer
    (ops.norm._gn_stats_from_pieces); everything else (shortcut,
    residual) uses the concat."""
    if isinstance(x, (tuple, list)):
        return x, jnp.concatenate(list(x), axis=-1)
    return x, x


class _GNParams(nn.Module):
    """Bare GroupNorm scale/bias params; the math lives in ops.norm so the
    FiLM-fused variant can reuse the same parameters."""

    @nn.compact
    def __call__(self, x, films=()):
        C = (
            sum(p.shape[-1] for p in x)
            if isinstance(x, (tuple, list))
            else x.shape[-1]
        )
        scale = self.param("scale", nn.initializers.ones_init(), (C,), jnp.float32)
        bias = self.param("bias", zeros, (C,), jnp.float32)
        if films:
            return adagn(x, _GROUPS, scale, bias, films)
        return gn_op(x, _GROUPS, scale, bias)


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
        self, x: jnp.ndarray, temb: jnp.ndarray, *, deterministic: bool = True
    ) -> jnp.ndarray:
        from infodiffusion_tpu.nn.attention import AttnBlock

        norm_in, x = _norm1_input(x)
        in_ch = x.shape[-1]
        h = _GNParams(name="norm1")(norm_in)
        h = nn.silu(h)
        h = _conv3(self.out_ch, self.dtype, "conv1")(h)

        t = _film_proj(temb.shape[-1], self.out_ch, self.dtype, "temb_proj")(
            nn.silu(temb)
        )
        t_scale, t_shift = jnp.split(t, 2, axis=-1)
        h = _GNParams(name="norm2")(h, films=[(t_scale, t_shift)])
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = _conv3(self.out_ch, self.dtype, "conv2")(h)

        h = _GNParams(name="norm3")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = _conv3(self.out_ch, self.dtype, "conv3")(h)

        if in_ch != self.out_ch:
            x = nn.Dense(
                self.out_ch, kernel_init=DEFAULT_KERNEL, bias_init=zeros,
                dtype=self.dtype, name="shortcut",
            )(x)
        h = h + x
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
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        from infodiffusion_tpu.nn.attention import AttnBlock

        norm_in, x = _norm1_input(x)
        in_ch = x.shape[-1]
        h = _GNParams(name="norm1")(norm_in)
        h = nn.silu(h)
        h = _conv3(self.out_ch, self.dtype, "conv1")(h)

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
        h = _GNParams(name="norm2")(
            h, films=[(t_scale, t_shift), (a_scale, a_shift)]
        )
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = _conv3(self.out_ch, self.dtype, "conv2")(h)

        h = _GNParams(name="norm3")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = _conv3(self.out_ch, self.dtype, "conv3")(h)

        if in_ch != self.out_ch:
            x = nn.Dense(
                self.out_ch, kernel_init=DEFAULT_KERNEL, bias_init=zeros,
                dtype=self.dtype, name="shortcut",
            )(x)
        h = h + x
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
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        from infodiffusion_tpu.nn.attention import AttnBlock

        norm_in, x = _norm1_input(x)
        in_ch = x.shape[-1]
        h = _GNParams(name="norm1")(norm_in)
        h = nn.silu(h)
        h = _conv3(self.out_ch, self.dtype, "conv1")(h)

        h = _GNParams(name="norm2")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = _conv3(self.out_ch, self.dtype, "conv2")(h)

        if in_ch != self.out_ch:
            x = nn.Dense(
                self.out_ch, kernel_init=DEFAULT_KERNEL, bias_init=zeros,
                dtype=self.dtype, name="shortcut",
            )(x)
        h = h + x
        if self.attn:
            h = AttnBlock(dtype=self.dtype, name="attn")(h)
        return h


class DownSample(nn.Module):
    """Stride-2 3x3 conv (reference: modules.py:63-75)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return _conv3(x.shape[-1], self.dtype, "conv", strides=2)(x)


class UpSample(nn.Module):
    """Nearest x2 then 3x3 conv (reference: modules.py:78-93)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return _conv3(C, self.dtype, "conv")(x)


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
