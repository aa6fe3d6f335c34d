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
"""

from __future__ import annotations

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


def _gn_stats(x: jnp.ndarray, num_groups: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(batch, group) mean/rstd in f32. x: [..., C]."""
    *lead, C = x.shape
    assert C % num_groups == 0, f"channels {C} not divisible by {num_groups}"
    import os

    if os.environ.get("INFODIFF_ABLATE_GN_STATS") == "1":
        # DIAGNOSTIC ONLY (not parity-correct): constant stats, so the
        # stats reductions vanish from the program — used to attribute
        # their cost in the sampler roofline analysis (tools/).
        shape = (x.shape[0], 1, num_groups, 1)
        return jnp.zeros(shape, jnp.float32), jnp.ones(shape, jnp.float32)
    xf = x.astype(jnp.float32).reshape(x.shape[0], -1, num_groups, C // num_groups)
    # one-pass stats (E[x^2] - mean^2): both reductions land in ONE XLA
    # fusion reading x once, vs two passes for the (x - mean)^2 form —
    # GN is bandwidth-bound so this halves its stats traffic. f32
    # accumulation keeps the cancellation benign at these magnitudes
    # (torch GroupNorm computes Welford/one-pass variance too).
    mean = xf.mean(axis=(1, 3), keepdims=True)
    mean_sq = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + _EPS)
    return mean, rstd


def group_norm(
    x: jnp.ndarray,
    num_groups: int,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
) -> jnp.ndarray:
    """Plain GroupNorm over the last axis of an NHWC (or [B, N, C]) tensor."""
    B, C = x.shape[0], x.shape[-1]
    mean, rstd = _gn_stats(x, num_groups)
    xf = x.astype(jnp.float32).reshape(B, -1, num_groups, C // num_groups)
    h = (xf - mean) * rstd
    h = h.reshape(x.shape)
    h = h * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return h.astype(x.dtype)


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
