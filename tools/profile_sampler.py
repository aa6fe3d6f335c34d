#!/usr/bin/env python
"""Capture an xprof trace of the flagship DDIM-100 sampler (the headline
benchmark) for op-level attribution of non-conv overhead.

Usage: python tools/profile_sampler.py [trace_dir]
Then:  python tools/trace_summary.py <trace_dir>
"""

import os
import sys

import jax
import jax.numpy as jnp
import jax.random as jr

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from infodiffusion_tpu.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_sampler"
    batch = int(os.environ.get("INFODIFF_BENCH_BATCH", "128"))
    steps = int(os.environ.get("INFODIFF_BENCH_STEPS", "100"))
    # INFODIFF_BENCH_SIZE: same knob as bench.py (128 = the
    # beyond-reference datapoint's attribution trace)
    size = int(os.environ.get("INFODIFF_BENCH_SIZE", "64"))

    from infodiffusion_tpu.diffusion import make_schedule, strided_ddim_loop
    from infodiffusion_tpu.models import InfoDiff

    model = InfoDiff(
        T=1000, a_dim=256, shape=(3, size, size), unets_channels=64,
        encoder_channels=64, mmd_weight=0.1, epochs=50, dtype=jnp.bfloat16,
    )
    x = jnp.zeros((1, size, size, 3))
    t0 = jnp.zeros((1,), jnp.int32)
    a0 = jnp.zeros((1, 256))
    rngs = {
        "params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
        "reparam": jr.PRNGKey(2), "dropout": jr.PRNGKey(3),
    }
    variables = jax.jit(lambda: model.init(rngs, x, t0, a0))()
    # INFODIFF_TURBO=int8 profiles the W8A8 turbo tier (ops/quant.py)
    if os.environ.get("INFODIFF_TURBO", ""):
        from infodiffusion_tpu.ops.quant import calibrate

        variables = calibrate(model, variables, (size, size, 3), a_dim=256,
                              T=1000,
                              mode=os.environ["INFODIFF_TURBO"])
    sched = make_schedule(1e-5, 1e-2, 1000)

    @jax.jit
    def sample(variables, xT, a, key):
        return strided_ddim_loop(
            lambda x, t, a: model.apply(variables, x, t, a),
            sched, xT, key, a, num_steps=steps,
        )

    key = jr.PRNGKey(0)
    xT = jr.normal(key, (batch, size, size, 3))
    a = jr.normal(key, (batch, 256))
    float(jnp.mean(sample(variables, xT, a, key)))  # compile + warmup
    with jax.profiler.trace(out):
        float(jnp.mean(sample(variables, xT, a, jr.fold_in(key, 1))))
    print(f"trace written to {out}")


if __name__ == "__main__":
    main()
