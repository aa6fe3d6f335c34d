#!/usr/bin/env python
"""Variance-controlled measurement of the latent-trajectory int8
weight stream (round-3 VERDICT item 7 / weak #5).

The round-3 end-to-end numbers for `--turbo int8` on the latent leg
(+1.3% one run, +4.9% another) sat inside the axon tunnel's run-to-run
variance, leaving the feature's value unmeasured. This tool times the
KERNEL level — `latent_trajectory_pallas` with the bf16 vs the int8
weight stream on identical inputs — the same methodology that
established the trajectory kernel's own win (76.6 vs 90.3 ms,
STATUS.md round-2 item 12): many reps, a fresh folded key per rep (the
tunnel may serve identical re-executions from cache), value-fetch sync
(block_until_ready can return early through the tunnel), and a
median-of-reps + spread report so the claim carries its own error bar.

Sweeps a_dim in {32, 64, 256} (every reference config class). Prints
one JSON line per a_dim:
  {"a_dim": N, "bf16_ms": .., "int8_ms": .., "speedup": ..,
   "bf16_spread_ms": .., "int8_spread_ms": .., "significant": bool}
where "significant" = the medians differ by more than the SUM of the
two spreads (IQR-style: max-min over the middle half of reps).

Env: INFODIFF_LTB_REPS (default 15), INFODIFF_LTB_BATCH (256),
INFODIFF_LTB_T (1000).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from infodiffusion_tpu.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import jax.random as jr


def significant(m_a, m_b, s_a, s_b):
    """IQR-style significance: the medians differ by more than the SUM
    of the two middle-half spreads. Deliberately conservative — over
    the axon tunnel a difference inside the spreads is noise
    (CLAUDE.md benchmark trap 2), and this tool exists to stop such
    noise being reported as a win."""
    return abs(m_a - m_b) > (s_a + s_b)


def measure(fn, key, reps, clock=time.perf_counter):
    """Median + middle-half spread of per-call seconds; a fresh folded
    key per rep and a value-fetch sync per rep (CLAUDE.md traps 1+2).
    ``clock`` is injectable so the statistics are unit-testable without
    patching the global clock (JAX's dispatch also reads it)."""
    times = []
    for i in range(reps):
        k = jr.fold_in(key, i)
        t0 = clock()
        out = fn(k)
        float(jnp.mean(out))
        times.append(clock() - t0)
    times.sort()
    n = len(times)
    mid = times[n // 4 : n - n // 4] or times
    median = times[n // 2]
    return median, max(mid) - min(mid)


def main():
    reps = int(os.environ.get("INFODIFF_LTB_REPS", "15"))
    B = int(os.environ.get("INFODIFF_LTB_BATCH", "256"))
    T = int(os.environ.get("INFODIFF_LTB_T", "1000"))

    from infodiffusion_tpu.diffusion.schedule import make_schedule
    from infodiffusion_tpu.models import Diff
    from infodiffusion_tpu.ops.pallas.latent_mlp import (
        pack_latent_unet_params,
    )
    from infodiffusion_tpu.ops.pallas.latent_traj import (
        latent_trajectory_pallas,
        quantize_packed_weights,
    )

    sched = make_schedule(1e-5, 1e-2, T)
    for a_dim in (32, 64, 256):
        model = Diff(T=T, shape=(1, a_dim, a_dim), is_latent=True,
                     dtype=jnp.bfloat16)
        rngs = {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
                "dropout": jr.PRNGKey(2)}
        v = jax.jit(
            lambda m=model, d=a_dim: m.init(
                rngs, jnp.zeros((B, d)), jnp.zeros((B,), jnp.int32)
            )
        )()
        packed = pack_latent_unet_params(
            v["params"]["backbone"], a_dim, dtype=jnp.bfloat16
        )
        packed_q = quantize_packed_weights(packed)
        xT = jr.normal(jr.PRNGKey(3), (B, a_dim), jnp.bfloat16)

        # packed weights ride as a jit ARGUMENT, never a closure
        # constant (CLAUDE.md BENCHMARK TRAP 1: constants disable XLA's
        # layout/donation handling and once made the latent MLP look 4x
        # slower) — matching how the product sampler passes params
        f = jax.jit(
            lambda pk_, k, xT_: latent_trajectory_pallas(
                pk_, sched, xT_, k, deterministic=True
            )
        )

        def run(pk):
            return lambda k, pk=pk: f(pk, k, xT)

        f_bf16, f_int8 = run(packed), run(packed_q)
        # parity spot check on identical keys
        k0 = jr.PRNGKey(9)
        d0 = float(jnp.max(jnp.abs(
            f_bf16(k0).astype(jnp.float32) - f_int8(k0).astype(jnp.float32)
        )))
        f_bf16(jr.PRNGKey(4)), f_int8(jr.PRNGKey(5))  # compile+warm
        m_b, s_b = measure(f_bf16, jr.PRNGKey(10), reps)
        m_i, s_i = measure(f_int8, jr.PRNGKey(11), reps)
        print(json.dumps({
            "a_dim": a_dim, "batch": B, "T": T, "reps": reps,
            "bf16_ms": round(m_b * 1e3, 2),
            "int8_ms": round(m_i * 1e3, 2),
            "speedup": round(m_b / m_i, 4),
            "bf16_spread_ms": round(s_b * 1e3, 2),
            "int8_spread_ms": round(s_i * 1e3, 2),
            "significant": significant(m_b, m_i, s_b, s_i),
            "max_abs_diff": d0,
        }), flush=True)


if __name__ == "__main__":
    main()
