#!/usr/bin/env python
"""Micro-benchmark: XLA vs Pallas single-head attention at the flagship
shapes (CelebA-64 attn level: N=256 tokens, C=128 channels).

Variants:
- xla:    einsum + softmax (what the model uses by default)
- pallas: per-batch-element grid (ops/pallas/attention.py)
- pallas_tiled: TB batch elements per grid step (batched MXU dots)

Run on the TPU: python tools/microbench_attention.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.random as jr
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from infodiffusion_tpu.ops.attention import _attention_xla
from infodiffusion_tpu.ops.pallas.attention import attention_pallas


def _tiled_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[...].astype(jnp.float32)  # [TB, N, C]
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # [TB, N, N]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    w = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        w, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[...] = o.astype(o_ref.dtype)


def attention_pallas_tiled(q, k, v, tb=8):
    B, N, C = q.shape
    assert B % tb == 0
    scale = float(C) ** -0.5
    spec = pl.BlockSpec((tb, N, C), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_tiled_kernel, scale=scale),
        grid=(B // tb,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, N, C), v.dtype),
    )(q, k, v)


def timeit(f, *args, reps=50):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    for dtype in (jnp.float32, jnp.bfloat16):
        for B, N, C in [(128, 256, 128), (128, 64, 256), (256, 256, 128)]:
            key = jr.PRNGKey(0)
            q = jr.normal(key, (B, N, C), dtype)
            k = jr.normal(key, (B, N, C), dtype)
            v = jr.normal(key, (B, N, C), dtype)
            fx = jax.jit(_attention_xla)
            tx = timeit(fx, q, k, v)
            line = f"{dtype.__name__} B{B} N{N} C{C}: xla {tx*1e6:.1f}us"
            try:
                fp = jax.jit(attention_pallas)
                tp = timeit(fp, q, k, v)
                line += f"  pallas {tp*1e6:.1f}us"
            except Exception as e:
                line += f"  pallas FAIL({type(e).__name__})"
            try:
                ft = jax.jit(functools.partial(attention_pallas_tiled, tb=8))
                tt = timeit(ft, q, k, v)
                line += f"  pallas_tiled {tt*1e6:.1f}us"
            except Exception as e:
                line += f"  pallas_tiled FAIL({type(e).__name__})"
            print(line, flush=True)


if __name__ == "__main__":
    main()
