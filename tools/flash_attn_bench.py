#!/usr/bin/env python
"""Kernel-level XLA-vs-flash attention timing at the large token
counts where XLA materializes the [N, N] logits to HBM (round 4; the
256px beyond-reference datapoint is N=4096).

Methodology (CLAUDE.md benchmark traps 1+2, same as qconv_bench /
latent_turbo_bench): inputs ride as jit arguments; each dispatch runs
``inner`` kernel invocations via lax.map with per-invocation-varied q
(the tunnel may serve identical re-executions from cache); sync is by
value fetch; the report is median-of-reps + middle-half spread, and
"significant" means the medians differ by more than the SUM of the two
spreads.

Prints one JSON line per (N, B) config:
  {"N": .., "B": .., "C": 128, "xla_ms": .., "flash_ms": ..,
   "speedup": .., "xla_spread_ms": .., "flash_spread_ms": ..,
   "significant": bool, "inner": ..}
(..._ms are per-invocation milliseconds = dispatch_time / inner.)

Env: INFODIFF_FAB_REPS (default 9), INFODIFF_FAB_CONFIGS
(default "256x128,512x128,1024x128,2048x64,4096x32" as NxB pairs —
batch scaled down with N to keep the logits footprint sane; the
default reproduces the full measured table in flash_attention.py's
docstring), INFODIFF_FAB_DTYPE (default bf16 — the policy dtype at
every attention site), INFODIFF_FAB_GRAD=1 to time the BACKWARD
instead (value+grad of a scalar through the op: the flash custom_vjp
Pallas kernel vs XLA autodiff of the dense path — the round-5
training-path evidence).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from infodiffusion_tpu.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import jax.random as jr

from tools.latent_turbo_bench import measure, significant  # noqa: E402

C = 128  # every reference attention site is 128-channel


def main():
    from infodiffusion_tpu.ops.attention import _attention_xla
    from infodiffusion_tpu.ops.pallas.flash_attention import flash_attention

    reps = int(os.environ.get("INFODIFF_FAB_REPS", "9"))
    dtype = (
        jnp.bfloat16
        if os.environ.get("INFODIFF_FAB_DTYPE", "bf16") == "bf16"
        else jnp.float32
    )
    configs = [
        tuple(int(t) for t in c.split("x"))
        # the default sweep reproduces the WHOLE measured table in
        # flash_attention.py's docstring, including the 256/512 rows
        # that set the crossover threshold (round-4 advisor finding)
        for c in os.environ.get(
            "INFODIFF_FAB_CONFIGS",
            "256x128,512x128,1024x128,2048x64,4096x32",
        ).split(",")
    ]

    grad_mode = os.environ.get("INFODIFF_FAB_GRAD") == "1"

    for N, B in configs:
        flops = (4 if not grad_mode else 14) * B * N * N * C
        # enough work per dispatch to amortize ~30 ms tunnel dispatch
        inner = max(8, int(3e12 / flops))
        q = jr.normal(jr.PRNGKey(0), (B, N, C), dtype)
        k = jr.normal(jr.PRNGKey(1), (B, N, C), dtype)
        v = jr.normal(jr.PRNGKey(2), (B, N, C), dtype)

        def run(fn):
            if grad_mode:
                # fwd + bwd: grads w.r.t. q/k/v of a scalar through the
                # op — flash takes its custom_vjp Pallas backward, the
                # dense path takes XLA autodiff (logits strip round-trips
                # HBM twice more in the backward)
                def scalar(q_, k_, v_):
                    return jnp.sum(fn(q_, k_, v_).astype(jnp.float32))

                g = jax.grad(scalar, argnums=(0, 1, 2))

                def invoke(q_, k_, v_):
                    dq, dk, dv = g(q_, k_, v_)
                    return (
                        jnp.sum(dq.astype(jnp.float32))
                        + jnp.sum(dk.astype(jnp.float32))
                        + jnp.sum(dv.astype(jnp.float32))
                    )
            else:
                def invoke(q_, k_, v_):
                    return jnp.sum(fn(q_, k_, v_).astype(jnp.float32))

            @jax.jit
            def dispatch(key, q, k, v):
                deltas = jr.uniform(key, (inner,), jnp.float32) * 1e-6

                def body(d):
                    return invoke(q * (1 + d).astype(dtype), k, v)

                return jnp.sum(jax.lax.map(body, deltas))

            return lambda key: dispatch(key, q, k, v)

        f_xla = run(_attention_xla)
        f_flash = run(flash_attention)
        # parity spot check on the hardware path
        d0 = float(
            jnp.max(
                jnp.abs(
                    flash_attention(q, k, v).astype(jnp.float32)
                    - _attention_xla(q, k, v).astype(jnp.float32)
                )
            )
        )
        m_x, s_x = measure(f_xla, jr.PRNGKey(5), reps)
        m_f, s_f = measure(f_flash, jr.PRNGKey(6), reps)
        to_ms = lambda s: 1e3 * s / inner
        print(
            json.dumps(
                {
                    "N": N, "B": B, "C": C, "inner": inner,
                    "grad": grad_mode,
                    "xla_ms": round(to_ms(m_x), 3),
                    "flash_ms": round(to_ms(m_f), 3),
                    "speedup": round(m_x / m_f, 3),
                    "xla_spread_ms": round(to_ms(s_x), 3),
                    "flash_spread_ms": round(to_ms(s_f), 3),
                    "significant": significant(m_x, m_f, s_x, s_f),
                    "max_abs_diff": d0,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
