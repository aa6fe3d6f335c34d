"""Timestep embeddings.

Two forms, matching the reference exactly:

- ``TimeEmbedding``: a precomputed [T, d_model] sinusoidal table with
  *interleaved* sin/cos pairs, followed by Linear -> SiLU -> Linear to
  ``dim`` (reference: modules.py:9-38). The table is a compile-time
  constant (XLA constant-folds it), not a parameter.
- ``timestep_embedding``: the functional variant used by ``LatentUNet``,
  with ``[cos | sin]`` *concatenated* halves and support for fractional
  timesteps (reference: modules.py:41-60). The two layouts differ; both
  are preserved.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn

from infodiffusion_tpu.nn.initializers import DEFAULT_KERNEL, zeros


def sinusoidal_table(T: int, d_model: int) -> jnp.ndarray:
    """[T, d_model] table with interleaved (sin, cos) pairs
    (reference: modules.py:13-20)."""
    assert d_model % 2 == 0
    freqs = jnp.exp(
        -jnp.arange(0, d_model, 2, dtype=jnp.float32) / d_model * math.log(10000.0)
    )
    args = jnp.arange(T, dtype=jnp.float32)[:, None] * freqs[None, :]
    # stack([sin, cos], -1).reshape -> [sin0, cos0, sin1, cos1, ...]
    emb = jnp.stack([jnp.sin(args), jnp.cos(args)], axis=-1)
    return emb.reshape(T, d_model)


def timestep_embedding(
    t: jnp.ndarray, dim: int, max_period: float = 10000.0
) -> jnp.ndarray:
    """Functional sinusoidal embedding, ``[cos | sin]`` concatenated
    (reference: modules.py:41-60). ``t`` may be float (fractional steps)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimeEmbedding(nn.Module):
    """Sinusoidal-table embedding + 2-layer MLP (reference: modules.py:9-38).

    ``t`` is an int array [B] of timestep indices in [0, T).
    """

    T: int
    d_model: int
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        table = sinusoidal_table(self.T, self.d_model)
        emb = table[t].astype(self.dtype)
        emb = nn.Dense(
            self.dim, kernel_init=DEFAULT_KERNEL, bias_init=zeros,
            dtype=self.dtype, name="dense0",
        )(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(
            self.dim, kernel_init=DEFAULT_KERNEL, bias_init=zeros,
            dtype=self.dtype, name="dense1",
        )(emb)
        return emb
