"""Fused GroupNorm + K-FiLM Pallas kernel.

One VMEM-resident pass per batch element: group statistics, normalize,
affine, then the FiLM chain ``h = h*(1+s_k) + b_k`` (K=1 for ResBlock's
time modulation, K=2 for AuxResBlock's time+aux double modulate;
reference: modules.py:247-258, 309-328). This is the bandwidth-bound
elementwise core of every ResBlock — fusing it avoids materializing the
normalized intermediate in HBM.

Group reductions are formulated as matmuls with a [C, G] one-hot group
matrix so they ride the MXU instead of awkward cross-lane reductions:
``sums[g] = sum_hw (x @ M)`` and channel broadcast back via ``M @ v``.
Statistics are f32 regardless of activation dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5
_VMEM_BUDGET = 10 * 1024 * 1024


def _group_matrix(C: int, G: int) -> np.ndarray:
    m = np.zeros((C, G), np.float32)
    gs = C // G
    for c in range(C):
        m[c, c // gs] = 1.0
    return m


def _kernel(x_ref, gm_ref, gamma_ref, beta_ref, films_ref, o_ref, *,
            HW: int, C: int, G: int, K: int):
    x = x_ref[0].reshape(HW, C).astype(jnp.float32)
    gm = gm_ref[:]  # [C, G]
    gs = C // G
    n = HW * gs
    s = jnp.sum(
        jnp.dot(x, gm, preferred_element_type=jnp.float32), axis=0,
        keepdims=True,
    )  # [1, G]
    ssq = jnp.sum(
        jnp.dot(x * x, gm, preferred_element_type=jnp.float32), axis=0,
        keepdims=True,
    )
    mean = s / n
    var = ssq / n - mean * mean
    rstd = jax.lax.rsqrt(var + _EPS)
    # broadcast per-group stats back to channels: [1,G] @ [G,C]
    mean_c = jnp.dot(mean, gm.T, preferred_element_type=jnp.float32)  # [1, C]
    rstd_c = jnp.dot(rstd, gm.T, preferred_element_type=jnp.float32)
    h = (x - mean_c) * rstd_c
    h = h * gamma_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    for k in range(K):
        scale = films_ref[0, 2 * k].astype(jnp.float32)  # [C]
        shift = films_ref[0, 2 * k + 1].astype(jnp.float32)
        h = h * (1.0 + scale[None, :]) + shift[None, :]
    o_ref[0] = h.reshape(o_ref.shape[1:]).astype(o_ref.dtype)


def adagn_pallas(x, num_groups, scale, bias, films, *, interpret=False):
    """x: [B, H, W, C] (or [B, N, C]); films: sequence of ([B,C], [B,C])."""
    orig_shape = x.shape
    B, C = x.shape[0], x.shape[-1]
    HW = int(np.prod(x.shape[1:-1]))
    G = num_groups
    K = len(films)
    if C % G:
        raise NotImplementedError("channels not divisible by groups")
    need = (2 * HW * C + C * G + 4 * C) * 4
    if need > _VMEM_BUDGET:
        raise NotImplementedError("adagn tile exceeds VMEM budget")

    gm = jnp.asarray(_group_matrix(C, G))
    # stack films -> [B, 2K, C] (scale0, shift0, scale1, shift1); batch
    # leads so the per-batch block keeps full trailing dims (TPU block
    # shape rule: last two dims must tile (8,128) or equal the array's)
    stacked = jnp.stack(
        [t for pair in films for t in pair], axis=1
    ) if K else jnp.zeros((B, 1, C), x.dtype)
    K_eff = K

    x3 = x.reshape(B, HW, C)
    out = pl.pallas_call(
        functools.partial(_kernel, HW=HW, C=C, G=G, K=K_eff),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, HW, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, G), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, stacked.shape[1], C), lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, HW, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HW, C), x.dtype),
        interpret=interpret,
    )(x3, gm, scale, bias, stacked)
    return out.reshape(orig_shape)
