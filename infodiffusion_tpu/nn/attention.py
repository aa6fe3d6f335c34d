"""Attention blocks (reference: modules.py:129-203).

Single-head full self-attention over the H*W token grid with 1x1-conv
projections — in NHWC a 1x1 conv is a Dense over the channel axis, which
maps straight onto the MXU. The softmax core routes through
``ops.single_head_attention`` (Pallas-fused on TPU).

``CrossAttnBlock`` mirrors the reference's (effectively unused) variant:
it is always constructed by AuxResBlock but only applied when
``crossattn=True``, which no reference configuration enables
(reference: modules.py:299-300,325-326). We keep the module for API
parity but — unlike the reference, which materializes its dead params in
every checkpoint — we only instantiate it when actually used, so our
checkpoints carry no dead weights (documented divergence).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from infodiffusion_tpu.nn.initializers import DEFAULT_KERNEL, zeros
from infodiffusion_tpu.ops import single_head_attention
from infodiffusion_tpu.ops.norm import group_norm as gn_op


class _GN(nn.Module):
    """GroupNorm(32) with torch-parity eps, stats in f32."""

    num_groups: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (C,), jnp.float32)
        bias = self.param("bias", zeros, (C,), jnp.float32)
        return gn_op(x, self.num_groups, scale, bias)


class AttnBlock(nn.Module):
    """x: [B, H, W, C] -> [B, H, W, C] residual attention
    (reference: modules.py:129-164)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        h = _GN(name="group_norm")(x)
        dense = lambda name: nn.Dense(
            C, kernel_init=DEFAULT_KERNEL, bias_init=zeros,
            dtype=self.dtype, name=name,
        )
        q = dense("proj_q")(h).reshape(B, H * W, C)
        k = dense("proj_k")(h).reshape(B, H * W, C)
        v = dense("proj_v")(h).reshape(B, H * W, C)
        h = single_head_attention(q, k, v).reshape(B, H, W, C)
        h = dense("proj")(h)
        return x + h


class CrossAttnBlock(nn.Module):
    """Query from ``a``, key/value from ``x`` (reference: modules.py:167-203).
    Note the reference shares one group_norm module for both inputs
    (modules.py:185-186); we do the same."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        norm = _GN(name="group_norm")
        h = norm(x)
        h_a = norm(a)
        dense = lambda name: nn.Dense(
            C, kernel_init=DEFAULT_KERNEL, bias_init=zeros,
            dtype=self.dtype, name=name,
        )
        q = dense("proj_q")(h_a).reshape(B, H * W, C)
        k = dense("proj_k")(h).reshape(B, H * W, C)
        v = dense("proj_v")(h).reshape(B, H * W, C)
        h = single_head_attention(q, k, v).reshape(B, H, W, C)
        h = dense("proj")(h)
        return x + h
