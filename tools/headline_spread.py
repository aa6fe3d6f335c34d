#!/usr/bin/env python
"""Headline adjudication: repeated fetch-synced DDIM-100 measurements
with per-rep records and middle-half spreads, both tiers, one JSON.

Round-4 context (VERDICT weak #2/#3): BENCH_r04 recorded turbo 94.87 /
bf16 77.72 — a -4.7% step from r03 (99.55/78.41) with no spread data,
during a round whose tunnel was intermittently wedged (CLAUDE.md).
This tool produces the rerun-or-bisect evidence: n reps per tier (the
bench's exact jitted program and sync discipline — per-rep folded key,
value-fetch sync, params as arguments), reporting median, best, and
middle-half spread so a real regression is distinguishable from
tunnel noise. Run it under a verified-healthy tunnel (the matmul
health check in CLAUDE.md) and append the verdict to BASELINE.md's
trend note.

Usage: python tools/headline_spread.py
Env: INFODIFF_HS_REPS (default 7), INFODIFF_BENCH_BATCH/STEPS/SIZE as
in bench.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.random as jr

from infodiffusion_tpu.cache import enable_compilation_cache

enable_compilation_cache()


def _spread(ts):
    """Middle-half spread of a sorted timing list (the repo's standard
    robust dispersion: p75 - p25 of the per-rep values)."""
    s = sorted(ts)
    n = len(s)
    return s[(3 * n) // 4] - s[n // 4]


def main():
    reps = int(os.environ.get("INFODIFF_HS_REPS", "7"))
    batch = int(os.environ.get("INFODIFF_BENCH_BATCH", "128"))
    steps = int(os.environ.get("INFODIFF_BENCH_STEPS", "100"))
    size = int(os.environ.get("INFODIFF_BENCH_SIZE", "64"))

    from infodiffusion_tpu.diffusion import make_schedule, strided_ddim_loop
    from infodiffusion_tpu.models import InfoDiff

    model = InfoDiff(
        T=1000, a_dim=256, shape=(3, size, size), unets_channels=64,
        encoder_channels=64, mmd_weight=0.1, epochs=50,
        dtype=jnp.bfloat16,
    )
    x = jnp.zeros((1, size, size, 3))
    rngs = {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
            "reparam": jr.PRNGKey(2), "dropout": jr.PRNGKey(3)}
    base_variables = jax.jit(
        lambda: model.init(rngs, x, jnp.zeros((1,), jnp.int32),
                           jnp.zeros((1, 256)))
    )()
    sched = make_schedule(1e-5, 1e-2, 1000)

    @jax.jit
    def sample(variables, xT, a, key):
        return strided_ddim_loop(
            lambda x_, t_, a_: model.apply(variables, x_, t_, a_),
            sched, xT, key, a, num_steps=steps,
        )

    key = jr.PRNGKey(0)
    xT = jr.normal(key, (batch, size, size, 3))
    a = jr.normal(key, (batch, 256))

    out = {"batch": batch, "steps": steps, "size": size, "reps": reps,
           "backend": jax.default_backend(), "tiers": {}}
    for tier in ("", "int8"):
        variables = base_variables
        if tier:
            from infodiffusion_tpu.ops.quant import calibrate

            variables = calibrate(model, variables, (size, size, 3),
                                  a_dim=256, T=1000, mode=tier)
        float(jnp.mean(sample(variables, xT, a, key)))  # compile+warm
        times = []
        for i in range(reps):
            k = jr.fold_in(key, i)
            t0 = time.perf_counter()
            float(jnp.mean(sample(variables, xT, a, k)))
            times.append(time.perf_counter() - t0)
        sps = sorted(batch / t for t in times)
        med = sps[len(sps) // 2]
        out["tiers"][tier or "bf16"] = {
            "per_rep_samples_per_sec": [round(v, 2) for v in sps],
            "median": round(med, 2),
            "best": round(sps[-1], 2),
            "mid_half_spread": round(_spread(sps), 2),
        }
        print(f"[{tier or 'bf16'}] median {med:.2f} best {sps[-1]:.2f} "
              f"spread {_spread(sps):.2f} samples/s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
