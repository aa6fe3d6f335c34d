#!/usr/bin/env python
"""HBM footprint report for the flagship programs (production sizing).

Compiles (cache-served when warm) the flagship train step and DDIM-100
sampler and prints XLA's own memory analysis per program: argument,
output, temp (live intermediates) and alias bytes — the numbers that
determine the largest batch a chip can hold. Device runtime stats
(`device.memory_stats()`) are empty over the remote-dispatch tunnel, so
the compiler's static analysis is the reliable source here.

Usage:  python tools/memory_report.py            # flagship b128 bf16
        INFODIFF_BENCH_BATCH=256 python tools/memory_report.py
        INFODIFF_BENCH_SIZE=256 ... # beyond-reference resolutions
                                    # (same knob as bench.py)
        INFODIFF_MEMREPORT_PROGRAMS=sampler  # or train / both (default)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.random as jr

from infodiffusion_tpu.cache import enable_compilation_cache

enable_compilation_cache()


def _gib(n):
    return f"{n / (1 << 30):.3f} GiB"


def _report(name, compiled):
    try:
        m = compiled.memory_analysis()
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"{name}: memory_analysis unavailable ({e})")
        return
    if m is None:
        print(f"{name}: memory_analysis unavailable on this backend")
        return
    total = (
        m.argument_size_in_bytes
        + m.output_size_in_bytes
        + m.temp_size_in_bytes
        - m.alias_size_in_bytes
    )
    print(
        f"{name}:\n"
        f"  arguments {_gib(m.argument_size_in_bytes)}  "
        f"output {_gib(m.output_size_in_bytes)}  "
        f"temp {_gib(m.temp_size_in_bytes)}  "
        f"aliased -{_gib(m.alias_size_in_bytes)}\n"
        f"  peak-resident (args+out+temp-alias): {_gib(total)}"
    )


def main():
    batch = int(os.environ.get("INFODIFF_BENCH_BATCH", "128"))
    size = int(os.environ.get("INFODIFF_BENCH_SIZE", "64"))
    use_bf16 = os.environ.get("INFODIFF_BENCH_BF16", "1") == "1"
    dtype = jnp.bfloat16 if use_bf16 else jnp.float32

    from infodiffusion_tpu.diffusion import make_schedule, strided_ddim_loop
    from infodiffusion_tpu.models import InfoDiff
    from infodiffusion_tpu.train import (
        create_train_state, make_optimizer, make_train_step,
    )

    model = InfoDiff(
        T=1000, a_dim=256, shape=(3, size, size), unets_channels=64,
        encoder_channels=64, mmd_weight=0.1, epochs=50, dtype=dtype,
    )
    print(f"flagship InfoDiff at {size}px, batch {batch}, "
          f"{'bf16' if use_bf16 else 'f32'} activations, "
          f"backend {jax.default_backend()}")

    programs = os.environ.get("INFODIFF_MEMREPORT_PROGRAMS", "both")
    if programs not in ("both", "train", "sampler"):
        # a typo (e.g. 'sample') must not silently skip a report
        raise SystemExit(
            f"INFODIFF_MEMREPORT_PROGRAMS={programs!r}: expected one of "
            "'both', 'train', 'sampler'"
        )

    # --- train step (donated buffers, the production configuration) ---
    if programs in ("both", "train"):
        x = jr.normal(jr.PRNGKey(0), (batch, size, size, 3))
        tx = make_optimizer(1e-4, 50, 1000)
        state = create_train_state(model, jr.PRNGKey(0), x, tx)
        step = make_train_step(model, tx, donate=True)
        lowered = jax.jit(
            step._fun if hasattr(step, "_fun") else step,
            donate_argnums=(0,),
        ).lower(state, x, 0) if not hasattr(step, "lower") else step.lower(
            state, x, 0
        )
        _report("train step", lowered.compile())
    if programs == "train":
        return

    # --- DDIM-100 sampler ---
    sched = make_schedule(1e-5, 1e-2, 1000)
    x0 = jnp.zeros((1, size, size, 3))
    rngs = {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
            "reparam": jr.PRNGKey(2), "dropout": jr.PRNGKey(3)}
    variables = jax.jit(
        lambda: model.init(rngs, x0, jnp.zeros((1,), jnp.int32),
                           jnp.zeros((1, 256)))
    )()

    @jax.jit
    def sample(variables, xT, a, key):
        return strided_ddim_loop(
            lambda x, t, a_: model.apply(variables, x, t, a_),
            sched, xT, key, a, num_steps=100,
        )

    xT = jr.normal(jr.PRNGKey(0), (batch, size, size, 3))
    a = jr.normal(jr.PRNGKey(0), (batch, 256))
    _report("DDIM-100 sampler",
            sample.lower(variables, xT, a, jr.PRNGKey(0)).compile())


if __name__ == "__main__":
    main()
