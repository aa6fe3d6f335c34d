"""MLP skip-net denoiser for vector latents (reference: models.py:166-234).

10 layers over [B, a_dim] latents: layer 0 maps a_dim -> 4*a_dim, middle
layers keep 4*a_dim with the *input* concatenated at every layer >= 1,
the last layer maps back to a_dim with no norm/act/cond. Conditioning is
the sinusoidal ``timestep_embedding`` (64ch) through a 2-layer MLP, fed
to each conditioned layer's MLPLNAct scale gate.

This is pure matmul work — ideal MXU food; a_dim in {32..256} keeps every
layer within one MXU tile pass.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from infodiffusion_tpu.nn.blocks import MLPLNAct
from infodiffusion_tpu.nn.embeddings import timestep_embedding
from infodiffusion_tpu.nn.initializers import zeros


class LatentUNet(nn.Module):
    """shape is the reference's latent pseudo-shape (1, a_dim, a_dim);
    only shape[-1] = a_dim matters (reference: models.py:166-222)."""

    T: int
    shape: Tuple[int, int, int]
    num_layers: int = 10
    dropout: float = 0.1
    activation: str = "silu"
    num_time_emb_channels: int = 64
    num_time_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, *, deterministic: bool = True):
        d = self.shape[-1]
        # time embed: sinusoid(64) -> Linear(64, d) -> SiLU -> Linear(d, d)
        # (reference: models.py:173-184)
        temb = timestep_embedding(t, self.num_time_emb_channels).astype(self.dtype)
        for i in range(self.num_time_layers):
            temb = nn.Dense(
                d, kernel_init=nn.initializers.lecun_normal(), bias_init=zeros,
                dtype=self.dtype, name=f"time_embed_{i}",
            )(temb)
            if i < self.num_time_layers - 1:
                temb = nn.silu(temb)

        skip_layers = set(range(1, self.num_layers))
        h = x
        for i in range(self.num_layers):
            if i == 0:
                act, norm, cond, out = self.activation, True, True, d * 4
                drop = self.dropout
            elif i == self.num_layers - 1:
                act, norm, cond, out = None, False, False, d
                drop = 0.0
            else:
                act, norm, cond, out = "silu", True, True, d * 4
                drop = self.dropout
            if i in skip_layers:
                h = jnp.concatenate([h, x], axis=-1)  # input skip (models.py:229-232)
            h = MLPLNAct(
                out_ch=out, norm=norm, use_cond=cond, activation=act,
                condition_bias=1.0, dropout=drop, dtype=self.dtype,
                name=f"layer_{i}",
            )(h, temb if cond else None, deterministic=deterministic)
        return h
