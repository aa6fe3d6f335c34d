"""Whole-forward fused Pallas kernel for the LatentUNet denoiser.

Measured motivation (STATUS.md): the latent sampler runs T=1000 steps of
a tiny 10-layer MLP; under XLA each step executes ~dozens of small HLOs
and lands at ~369 us/step (batch 256) — ~9% of compute roofline and far
from bandwidth limits, i.e. launch/serialization-overhead-bound. This
kernel runs ONE pallas_call per forward: all ten layers unrolled with
weights streamed HBM->VMEM via double-buffered async DMA and the
LN/FiLM/SiLU chain fused between matmuls (reference semantics:
models.py:166-234 / MLPLNAct models.py:91-163).

Layer uniformization: weights are zero-padded to [L, 1280, 1024] (layer 0
uses rows :256; layer 9's true output occupies cols :256) so every layer
is one [B,1280]x[1280,1024] MXU matmul; zero padding contributes zeros.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5


def fused_latent_supported(backbone_params: Dict, a_dim: int) -> bool:
    """True when the param tree is the reference LatentUNet architecture
    this kernel hard-codes: 10 layers, hidden 4*a_dim, 2 time layers,
    layers 0-8 conditioned+normalized (norm/linear_emb present — the
    kernel bakes in the FiLM/LayerNorm/SiLU chain), layer 9 plain."""
    try:
        for i in range(10):
            layer = backbone_params[f"layer_{i}"]
            k = layer["linear"]["kernel"]
            want_in = a_dim if i == 0 else 5 * a_dim
            want_out = a_dim if i == 9 else 4 * a_dim
            if tuple(k.shape) != (want_in, want_out):
                return False
            has_cond = "linear_emb" in layer and "norm" in layer
            if has_cond != (i < 9):
                return False
        backbone_params["time_embed_0"]["kernel"]
        backbone_params["time_embed_1"]["kernel"]
        if "layer_10" in backbone_params or "time_embed_2" in backbone_params:
            return False
    except (KeyError, TypeError):
        return False
    return True


def use_fused_latent() -> bool:
    """Opt-in via its OWN env var (INFODIFF_ENABLE_FUSED_LATENT=1), not
    the INFODIFF_ENABLE_PALLAS umbrella: this kernel is a measured ~10%
    pessimization vs XLA, and bundling it under a flag users set for
    wins elsewhere would regress them silently.

    Measurement history (v5e, T=1000): an early benchmark showed this
    kernel 4.3x faster than XLA — but that baseline captured the params
    as jit CLOSURE CONSTANTS, which alone makes the XLA latent MLP ~4x
    slower. Against the framework's real path (params passed as jit
    arguments) XLA wins ~10% at every batch (b64 76.0 vs 84.5 ms, b256
    96.0 vs 106.7, b512 145.7 vs 155.7 per 1000 steps). Kept as a
    parity-tested alternative path."""
    from infodiffusion_tpu.ops.gating import pallas_enabled

    return pallas_enabled("INFODIFF_ENABLE_FUSED_LATENT")


def pack_latent_unet_params(
    params: Dict, a_dim: int, dtype: jnp.dtype = jnp.float32
) -> Dict[str, jnp.ndarray]:
    """Stack + pad the LatentUNet backbone params for the fused kernel.

    ``params``: the Diff(is_latent=True) param tree's ['backbone'] subtree
    (layers named layer_0..layer_9, time_embed_0/1). Only supports the
    reference architecture (num_layers=10, hidden 4*a_dim). ``dtype``
    sets the matmul-weight dtype — f32 default (matches the module dtype
    policy default); callers pass the model's dtype (samplers.py does).
    """
    L = 10
    d = a_dim
    h = 4 * d
    win = h + d  # 1280 for d=256
    W = np.zeros((L, win, h), np.float32)
    B = np.zeros((L, h), np.float32)
    Wc = np.zeros((L, d, h), np.float32)
    Bc = np.zeros((L, h), np.float32)
    G = np.ones((L, h), np.float32)
    Be = np.zeros((L, h), np.float32)
    for i in range(L):
        p = params[f"layer_{i}"]
        k = np.asarray(p["linear"]["kernel"], np.float32)
        b = np.asarray(p["linear"]["bias"], np.float32)
        if i == 0:
            W[i, :d, :] = k  # [d, h]
            B[i] = b
        elif i == L - 1:
            W[i, :, :d] = k  # [win, d] -> cols :d
            B[i, :d] = b
        else:
            W[i] = k  # [win, h]
            B[i] = b
        if "linear_emb" in p:
            Wc[i] = np.asarray(p["linear_emb"]["kernel"], np.float32)
            Bc[i] = np.asarray(p["linear_emb"]["bias"], np.float32)
        if "norm" in p:
            G[i] = np.asarray(p["norm"]["scale"], np.float32)
            Be[i] = np.asarray(p["norm"]["bias"], np.float32)
    t0 = params["time_embed_0"]
    t1 = params["time_embed_1"]
    return {
        "W": jnp.asarray(W, dtype),
        "B": jnp.asarray(B),
        "Wc": jnp.asarray(Wc, dtype),
        "Bc": jnp.asarray(Bc),
        "G": jnp.asarray(G),
        "Be": jnp.asarray(Be),
        "te0_k": jnp.asarray(t0["kernel"]), "te0_b": jnp.asarray(t0["bias"]),
        "te1_k": jnp.asarray(t1["kernel"]), "te1_b": jnp.asarray(t1["bias"]),
    }


def _kernel(x_ref, s_ref, w_hbm, wc_ref, b_ref, bc_ref, g_ref, be_ref,
            o_ref, wbuf, sems, *, L: int, d: int, h: int):
    """x: [B, d]; s = silu(time cond) [B, d]; weights streamed per layer."""
    win = h + d
    mm_dtype = w_hbm.dtype  # matmul input dtype follows the packed weights

    def w_dma(slot, layer):
        return pltpu.make_async_copy(
            w_hbm.at[layer], wbuf.at[slot], sems.at[slot]
        )

    w_dma(0, 0).start()
    x = x_ref[...].astype(jnp.float32)
    s = s_ref[...].astype(jnp.float32)
    hcur = None  # layer 0 reads x directly
    for i in range(L):
        if i + 1 < L:
            w_dma((i + 1) % 2, i + 1).start()
        # assemble padded input [B, win]
        if i == 0:
            inp = jnp.concatenate(
                [x, jnp.zeros((x.shape[0], win - d), jnp.float32)], axis=1
            )
        else:
            inp = jnp.concatenate([hcur, x], axis=1)
        w_dma(i % 2, i).wait()
        z = jax.lax.dot_general(
            inp.astype(mm_dtype), wbuf[i % 2],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[i][None, :]
        if i < L - 1:
            c = jax.lax.dot_general(
                s.astype(mm_dtype), wc_ref[i],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bc_ref[i][None, :]
            z = z * (1.0 + c)
            mu = jnp.mean(z, axis=1, keepdims=True)
            var = jnp.mean(jnp.square(z - mu), axis=1, keepdims=True)
            z = (z - mu) * jax.lax.rsqrt(var + _EPS)
            z = z * g_ref[i][None, :] + be_ref[i][None, :]
            z = z * jax.nn.sigmoid(z)  # silu
            hcur = z
        else:
            hcur = z[:, :d]
    o_ref[...] = hcur.astype(o_ref.dtype)


def latent_unet_forward_pallas(packed, x: jnp.ndarray,
                               silu_temb: jnp.ndarray,
                               interpret: bool = False,
                               block_b: int = 256) -> jnp.ndarray:
    """Fused forward: eps = MLP(x, cond). ``silu_temb`` = silu(time_embed)
    precomputed once per step (it is layer-invariant).

    The batch is tiled over a 1-D grid in ``block_b``-row blocks so VMEM
    use is bounded regardless of batch size (an untiled first cut OOMed
    scoped vmem at b1024); every row is independent (LayerNorm runs over
    features), so partial trailing blocks are safe."""
    Bsz, d = x.shape
    L, win, h = packed["W"].shape
    bt = min(block_b, Bsz)
    grid = ((Bsz + bt - 1) // bt,)

    def rows(shape):
        return pl.BlockSpec(shape, lambda b: (b,) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)

    def full(arr):
        return pl.BlockSpec(arr.shape, lambda b: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, L=L, d=d, h=h),
        grid=grid,
        in_specs=[
            rows((bt, d)),                          # x
            rows((bt, d)),                          # silu(temb)
            pl.BlockSpec(memory_space=pl.ANY),      # W (HBM, DMAed)
            full(packed["Wc"]), full(packed["B"]), full(packed["Bc"]),
            full(packed["G"]), full(packed["Be"]),
        ],
        out_specs=rows((bt, d)),
        out_shape=jax.ShapeDtypeStruct((Bsz, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, win, h), packed["W"].dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, silu_temb, packed["W"], packed["Wc"], packed["B"], packed["Bc"],
      packed["G"], packed["Be"])
    return out


def latent_eps_fn(packed, num_time_emb_channels: int = 64,
                  interpret: bool = False):
    """eps_fn(x, t, a) closure for the samplers, using the fused kernel.
    Computes the (tiny) time-embedding MLP in XLA, then one pallas call."""
    from infodiffusion_tpu.nn.embeddings import timestep_embedding

    def eps(x, t, a=None):
        temb = timestep_embedding(t, num_time_emb_channels)
        temb = temb @ packed["te0_k"] + packed["te0_b"]
        temb = jax.nn.silu(temb)
        temb = temb @ packed["te1_k"] + packed["te1_b"]
        s = jax.nn.silu(temb)
        return latent_unet_forward_pallas(
            packed, x.astype(jnp.float32), s, interpret=interpret
        )

    return eps
