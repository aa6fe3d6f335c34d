#!/usr/bin/env python
"""Capture an xprof trace of the flagship train step (full InfoDiff
loss: backbone+encoder fwd/bwd + MMD + AdamW) for roofline attribution.

Usage: python tools/profile_train.py [trace_dir]
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
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_train"
    batch = int(os.environ.get("INFODIFF_BENCH_BATCH", "128"))

    from infodiffusion_tpu.models import InfoDiff
    from infodiffusion_tpu.train import (
        create_train_state, make_optimizer, make_train_step,
    )

    model = InfoDiff(
        T=1000, a_dim=256, shape=(3, 64, 64), unets_channels=64,
        encoder_channels=64, mmd_weight=0.1, epochs=50, dtype=jnp.bfloat16,
    )
    x = jr.normal(jr.PRNGKey(0), (batch, 64, 64, 3))
    tx = make_optimizer(1e-4, 50, 1000)
    state = create_train_state(model, jr.PRNGKey(0), x, tx)
    # donate=False: a traced step must not invalidate the warmup buffers
    step = make_train_step(model, tx, donate=False)
    state, m = step(state, x, 0)
    float(m["loss"])  # compile + warmup (value fetch = reliable sync)
    with jax.profiler.trace(out):
        state, m = step(state, x + 1e-6, 1)
        float(m["loss"])
    print(f"trace written to {out}")


if __name__ == "__main__":
    main()
