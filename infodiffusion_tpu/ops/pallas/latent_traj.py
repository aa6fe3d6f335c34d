"""Whole-TRAJECTORY fused Pallas kernel for the latent DDIM/DDPM sampler.

Why a trajectory kernel (and not just the per-forward one in
latent_mlp.py): the latent sampler's XLA step is OVERHEAD-bound, not
bandwidth- or compute-bound — ~96 us/step at batch 256 against a ~29 us
MXU floor and a ~32 us weight-stream floor, because each of the 1000
scan iterations re-executes ~40 small HLOs (ten matmuls plus the
LN/FiLM/SiLU chains) and re-streams all ~26 MB of MLP weights from HBM.
The per-forward fused kernel removed the per-op overhead *within* a
step but still paid a pallas_call dispatch + full weight stream per
step, landing ~10% BEHIND XLA (latent_mlp.py has the history).

This kernel runs the ENTIRE T-step trajectory in ONE pallas_call:

- the step loop is a ``fori_loop`` inside the kernel — zero dispatch
  boundaries for 1000 steps;
- layer weights stream HBM->VMEM with double-buffered async DMA,
  overlapped across layer AND step boundaries (the weight sequence is
  periodic, so slot j%2 is static per layer);
- the per-step FiLM rows are PRECOMPUTED outside (the conditioning
  ``1 + silu_temb @ Wc + Bc`` depends only on the timestep, not the
  batch) and DMA'd per step — this also removes the Wc stream (5 MB)
  and nine [B,d]x[d,h] matmuls from every step;
- the DDIM/DDPM update is affine in (x, eps, noise):
  ``x' = cx[i]*x + ce[i]*eps + cn[i]*noise`` with [S]-shaped coefficient
  tables derived from the Schedule (including the reference's
  alpha_prev_bars x0-estimate quirk and eta=0.01 — schedule.py), so one
  kernel serves stochastic DDIM, DDPM (cn[last]=0) and reverse
  encoding (cn=0);
- noise parity: the per-step Gaussians are PRE-DRAWN outside with
  exactly ``sample_loop``'s key chain (key, k = split(key) per step)
  and streamed from HBM per step (262 KB/step at b256) — trajectories
  match the XLA path to float tolerance, not just in distribution.

Measured (v5e, T=1000, b256, bf16 weights): see use_fused_latent_traj —
this is the framework's first Pallas kernel that BEATS XLA, because the
win comes from something XLA structurally cannot do: keep 1000 steps
inside one program with weights/conditioning/noise pipelined across the
step boundary.

Reference semantics: sampling.py:23-60 (update rules),
models.py:166-234 (LatentUNet), utils.py via latent_mlp.pack.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import jax.random as jr
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from infodiffusion_tpu.diffusion.schedule import DEFAULT_ETA, Schedule

_EPS = 1e-5


def fused_traj_shapes_ok(a_dim: int) -> bool:
    """Mosaic lane alignment. ``a_dim`` is the lane dimension of the
    trajectory state, the per-step noise DMA slices and the layer-9
    output slice; sub-128 lane widths fail to compile on hardware, so
    latent_trajectory_pallas ZERO-PADS those lanes up to a 128 multiple
    (the padded lanes carry exact zeros end to end — pack_latent_unet_params
    zero-fills the unused weight rows, so they contribute nothing).
    What cannot be padded away is the HIDDEN width h = 4*a_dim (the
    LayerNorm/FiLM/SiLU rows run at h lanes), so the gate requires
    h % 128 == 0, i.e. a_dim % 32 == 0 — which covers every reference
    config (a_dim 32 mnist/fmnist scripts, 256 flagship; run.py:61)."""
    return a_dim % 32 == 0


def use_fused_latent_traj() -> bool:
    """Default ON for real-TPU runs (this kernel measured FASTER than
    XLA end-to-end — the numbers live in STATUS.md); opt out with
    INFODIFF_DISABLE_PALLAS=1 (the umbrella escape hatch) or
    INFODIFF_DISABLE_FUSED_LATENT_TRAJ=1 (just this kernel)."""
    import os

    if os.environ.get("INFODIFF_DISABLE_PALLAS") == "1":
        return False
    if os.environ.get("INFODIFF_DISABLE_FUSED_LATENT_TRAJ") == "1":
        return False
    return jax.default_backend() == "tpu"


def quantize_packed_weights(packed):
    """int8 weight STREAM for the trajectory kernel (the latent leg of
    the ``--turbo int8`` tier): per-(layer, output-column) symmetric int8
    of the packed ``W`` stack, dequantized in-register after the DMA.

    Why it was built: ~26 MB of MLP weights cross HBM per step at
    a_dim=256 bf16, and int8 halves that stream; the matmul still runs
    bf16 on the MXU (int8 values are exact in bf16) with the per-column
    scale applied to the f32 accumulator, so the only new error is the
    weight rounding itself — the same W8 granularity as the conv tier
    (ops/quant.py quantize_weight). Zero-padded rows/columns stay exact
    zeros. Returns ``packed`` with ``W`` int8 and a new ``Wsc`` [L, h]
    f32 scale table (VMEM-resident in the kernel, 40 KB).

    MEASURED NEUTRAL (round 4, tools/latent_turbo_bench.py — the
    variance-controlled kernel-level measurement the round-3 e2e
    numbers lacked): bf16 vs int8 stream at b256/T=1000 is 33.68 vs
    33.57 ms (a_dim=32), 36.19 vs 35.93 (64), 75.16 vs 74.20 (256) —
    1.003-1.013x, every delta inside the middle-half spread of 15 reps.
    The cross-step double buffering already hides the weight DMA behind
    the matmuls, so the stream is latency-irrelevant at every reference
    a_dim; the feature stays for tier uniformity, not speed."""
    W = packed["W"].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(W), axis=1)  # [L, h]
    sc = jnp.maximum(absmax, 1e-30) / 127.0
    Wq = jnp.clip(jnp.round(W / sc[:, None, :]), -127.0, 127.0)
    return {**packed, "W": Wq.astype(jnp.int8), "Wsc": sc}


def sampling_coefficients(sched: Schedule, idxs, deterministic: bool,
                          eta: float = DEFAULT_ETA):
    """Per-step affine-update coefficients (cx, ce, cn), each [S] f32,
    for ``x' = cx*x + ce*eps + cn*noise`` at timestep ``idxs[i]``.

    Exactly the algebra of schedule.ddim_step / ddpm_step (incl. the
    alpha_prev_bars[idx] x0-estimate quirk and the idx==0 behaviors);
    the factored form reassociates a few f32 products, so trajectories
    match the scan path to ~1e-5 relative, not bitwise."""
    idxs = jnp.asarray(idxs, jnp.int32)
    ab = sched.alpha_bars[idxs]
    apb = sched.alpha_prev_bars[idxs]
    if deterministic:  # stochastic DDIM, eta=0.01 (reference branch)
        prev = jnp.maximum(idxs - 1, 0)
        apb_prev = sched.alpha_prev_bars[prev]
        ab_prev = sched.alpha_bars[prev]
        beta_prev = sched.betas[prev]
        sigma = (
            eta
            * jnp.sqrt((1.0 - apb_prev) / (1.0 - ab_prev))
            * jnp.sqrt(beta_prev)
        )
        cx = jnp.sqrt(apb_prev) / jnp.sqrt(apb)
        ce = (
            jnp.sqrt(1.0 - apb_prev - sigma**2)
            - jnp.sqrt(apb_prev) * jnp.sqrt(1.0 - apb) / jnp.sqrt(apb)
        )
        cn = sigma
        # idx == 0: the update returns the x0 estimate, and apb[0] == 1
        # makes that estimate exactly x (schedule.py predict_x0 quirk)
        last = idxs == 0
        cx = jnp.where(last, 1.0, cx)
        ce = jnp.where(last, 0.0, ce)
        cn = jnp.where(last, 0.0, cn)
    else:  # DDPM ancestral
        beta = sched.betas[idxs]
        alpha = sched.alphas[idxs]
        inv_sqrt_a = jnp.sqrt(1.0 / alpha)
        cx = inv_sqrt_a
        ce = -inv_sqrt_a * beta / jnp.sqrt(1.0 - ab)
        cn = jnp.sqrt((1.0 - apb) / (1.0 - ab) * beta)
        cn = jnp.where(idxs == 0, 0.0, cn)
    return cx, ce, cn


def reverse_coefficients(sched: Schedule, idxs):
    """Coefficients for the deterministic forward-encoding step
    (schedule.ddim_reverse_step): x' = cx*x + ce*eps, cn = 0."""
    idxs = jnp.asarray(idxs, jnp.int32)
    apb = sched.alpha_prev_bars[idxs]
    apb_next = sched.alpha_prev_bars[idxs + 1]
    cx = jnp.sqrt(apb_next) / jnp.sqrt(apb)
    ce = (
        jnp.sqrt(1.0 - apb_next)
        - jnp.sqrt(apb_next) * jnp.sqrt(1.0 - apb) / jnp.sqrt(apb)
    )
    return cx, ce, jnp.zeros_like(cx)


def _kernel(*refs, S: int, L: int, d: int, h: int, bt: int, wq: bool):
    if wq:  # int8 weight stream: extra VMEM-resident scale table
        (x_ref, coef_ref, w_hbm, c_hbm, n_hbm, b_ref, g_ref, be_ref,
         wsc_ref, o_ref, wbuf, cbuf, nbuf, wsem, csem, nsem) = refs
    else:
        (x_ref, coef_ref, w_hbm, c_hbm, n_hbm, b_ref, g_ref, be_ref,
         o_ref, wbuf, cbuf, nbuf, wsem, csem, nsem) = refs
        wsc_ref = None
    win = h + d
    # int8 weights matmul in bf16 (values <= 127 are exact in bf16; the
    # input cast matches the bf16-weight path's precision)
    wdtype = jnp.bfloat16 if wq else w_hbm.dtype
    b0 = pl.program_id(0) * bt

    def w_dma(slot, layer):
        return pltpu.make_async_copy(
            w_hbm.at[layer], wbuf.at[slot], wsem.at[slot]
        )

    def c_dma(slot, step):
        return pltpu.make_async_copy(
            c_hbm.at[step], cbuf.at[slot], csem.at[slot]
        )

    def n_dma(slot, step):
        return pltpu.make_async_copy(
            n_hbm.at[step, pl.ds(b0, bt)], nbuf.at[slot], nsem.at[slot]
        )

    # prologue: step 0's weights (layer 0), FiLM rows and noise in flight
    w_dma(0, 0).start()
    c_dma(0, 0).start()
    n_dma(0, 0).start()

    def body(i, x):
        islot = i % 2
        c_dma(islot, i).wait()

        @pl.when(i + 1 < S)
        def _prefetch_step():
            c_dma((i + 1) % 2, i + 1).start()
            n_dma((i + 1) % 2, i + 1).start()

        hcur = None
        eps = None
        for j in range(L):
            if j + 1 < L:
                # program order puts this after layer j-1's matmul (the
                # last reader of slot (j+1)%2), so the overwrite is safe
                w_dma((j + 1) % 2, j + 1).start()
            w_dma(j % 2, j).wait()
            wmat = wbuf[j % 2]
            if wq:
                wmat = wmat.astype(wdtype)
            if j == 0:
                z = lax.dot_general(
                    x.astype(wdtype), wmat[:d, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                inp = jnp.concatenate([hcur, x], axis=1)
                z = lax.dot_general(
                    inp.astype(wdtype), wmat,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            if wq:  # per-output-column dequant on the f32 accumulator
                z = z * wsc_ref[j][None, :]
            z = z + b_ref[j][None, :]
            if j < L - 1:
                z = z * cbuf[islot, j][None, :]  # precomputed 1 + FiLM
                mu = jnp.mean(z, axis=1, keepdims=True)
                var = jnp.mean(jnp.square(z - mu), axis=1, keepdims=True)
                z = (z - mu) * lax.rsqrt(var + _EPS)
                z = z * g_ref[j][None, :] + be_ref[j][None, :]
                hcur = z * jax.nn.sigmoid(z)  # silu
            else:
                eps = z[:, :d]
            if j == L - 1:
                @pl.when(i + 1 < S)
                def _prefetch_next_step_weights():
                    w_dma(0, 0).start()

        n_dma(islot, i).wait()
        # coef lives in SMEM: scalar reads with a dynamic step index
        x_new = (
            coef_ref[i, 0] * x
            + coef_ref[i, 1] * eps
            + coef_ref[i, 2] * nbuf[islot]
        )
        return x_new

    x = lax.fori_loop(0, S, body, x_ref[...].astype(jnp.float32))
    o_ref[...] = x.astype(o_ref.dtype)


def latent_trajectory_pallas(
    packed, sched: Schedule, xT: jnp.ndarray, key,
    *, deterministic: bool, eta: float = DEFAULT_ETA,
    idxs=None, reverse: bool = False, noises=None,
    num_time_emb_channels: int = 64,
    interpret: bool = False, block_b: int = 256,
) -> jnp.ndarray:
    """Run a whole latent trajectory in one pallas_call.

    ``packed`` is latent_mlp.pack_latent_unet_params output, optionally
    passed through :func:`quantize_packed_weights` (int8 ``W`` + ``Wsc``
    — the turbo tier's latent leg). ``idxs`` defaults to the full
    reverse grid T-1..0 (or 1..T-2 when ``reverse=True``, matching
    reverse_sample_loop). ``noises`` optionally injects the per-step
    draws (parity tests); by default they are pre-drawn with exactly
    sample_loop's key chain."""
    B, d = xT.shape
    L, win, h = packed["W"].shape
    wq = packed["W"].dtype == jnp.int8
    assert not wq or "Wsc" in packed, "int8 W requires the Wsc scale table"
    # Mosaic rejects sub-128 lane widths: pad the state/noise/eps lane
    # dimension d up to a 128 multiple. The padded weight rows are exact
    # zeros (appended below; layer 0's rows d:win are already zero from
    # pack_latent_unet_params), padded noise lanes are zero, so the
    # padded state lanes stay exactly zero through every step and the
    # real lanes are untouched (fused_traj_shapes_ok has the contract).
    dp = -(-d // 128) * 128
    if idxs is None:
        idxs = (
            jnp.arange(1, sched.T - 1)
            if reverse else jnp.arange(sched.T - 1, -1, -1)
        )
    S = int(idxs.shape[0])

    # per-step conditioning rows: silu(temb MLP), then the full FiLM
    # multiplier 1 + s @ Wc + Bc per layer — [S, L, h] f32 in HBM
    from infodiffusion_tpu.nn.embeddings import timestep_embedding

    temb = timestep_embedding(idxs, num_time_emb_channels)
    temb = temb @ packed["te0_k"] + packed["te0_b"]
    temb = jax.nn.silu(temb)
    temb = temb @ packed["te1_k"] + packed["te1_b"]
    s = jax.nn.silu(temb).astype(jnp.float32)  # [S, d]
    c_all = 1.0 + (
        jnp.einsum("sd,ldh->slh", s, packed["Wc"].astype(jnp.float32))
        + packed["Bc"][None, :, :]
    )
    # the per-step DMA slices [1, Lp, h]: Lp must align to the 8-sublane
    # tiling (Mosaic rejects 10)
    Lp = (L + 7) // 8 * 8
    c_all = jnp.pad(c_all, ((0, 0), (0, Lp - L), (0, 0)))

    if reverse:
        cx, ce, cn = reverse_coefficients(sched, idxs)
    else:
        cx, ce, cn = sampling_coefficients(sched, idxs, deterministic, eta)
    coef = jnp.stack([cx, ce, cn], axis=1)  # [S, 3] f32 (SMEM)

    if noises is None:
        if reverse:
            noises = jnp.zeros((S, B, d), jnp.float32)
        else:
            def gen(k, _):
                k, sub = jr.split(k)
                return k, jr.normal(sub, (B, d), dtype=xT.dtype)

            _, noises = lax.scan(gen, key, None, length=S)
    noises = noises.astype(jnp.float32)

    W = packed["W"]
    xT_in = xT.astype(jnp.float32)
    if dp != d:
        xT_in = jnp.pad(xT_in, ((0, 0), (0, dp - d)))
        noises = jnp.pad(noises, ((0, 0), (0, 0), (0, dp - d)))
        # weight rows win..win+dp-d pair with the padded x lanes of the
        # concat([h, x]) input in layers >= 1; zeros keep them inert
        W = jnp.pad(W, ((0, 0), (0, dp - d), (0, 0)))

    # f32 weights double the wbuf footprint — halve the batch tile
    bt = min(block_b if packed["W"].dtype != jnp.float32 else block_b // 2,
             B)
    bt = max(bt, 8)
    grid = ((B + bt - 1) // bt,)

    # BlockSpec operands (xT, out) are padded/masked by pallas on partial
    # blocks, but the HAND-ROLLED noise DMA is not bounds-checked on
    # hardware: pad the noise rows up to the block grid so the trailing
    # block's n_hbm.at[step, pl.ds(b0, bt)] stays in bounds (B < 8 and
    # B % bt != 0 both land here).
    Bp = grid[0] * bt
    if Bp != B:
        noises = jnp.pad(noises, ((0, 0), (0, Bp - B), (0, 0)))

    def rows(shape):
        return pl.BlockSpec(shape, lambda b: (b,) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)

    def full(arr):
        return pl.BlockSpec(arr.shape, lambda b: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    in_specs = [
        rows((bt, dp)),                     # xT block (lane-padded)
        pl.BlockSpec(                       # [S, 3] f32 scalars
            coef.shape, lambda b: (0, 0), memory_space=pltpu.SMEM
        ),
        pl.BlockSpec(memory_space=pltpu.HBM),  # W    (DMAed per layer)
        pl.BlockSpec(memory_space=pltpu.HBM),  # c_all (DMAed per step)
        pl.BlockSpec(memory_space=pltpu.HBM),  # noises (DMAed per step)
        full(packed["B"]), full(packed["G"]), full(packed["Be"]),
    ]
    args = [xT_in, coef, W, c_all, noises,
            packed["B"], packed["G"], packed["Be"]]
    if wq:
        in_specs.append(full(packed["Wsc"]))  # [L, h] dequant scales
        args.append(packed["Wsc"])
    out = pl.pallas_call(
        functools.partial(_kernel, S=S, L=L, d=dp, h=h, bt=bt, wq=wq),
        grid=grid,
        in_specs=in_specs,
        out_specs=rows((bt, dp)),
        out_shape=jax.ShapeDtypeStruct((B, dp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, W.shape[1], h), W.dtype),
            pltpu.VMEM((2, Lp, h), jnp.float32),
            pltpu.VMEM((2, bt, dp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*args)
    if dp != d:
        out = out[:, :d]
    # match the scan path's dtype contract (carry keeps xT's dtype)
    return out.astype(xT.dtype)
