#!/usr/bin/env python
"""FLOP accounting for the flagship sampler — the basis of the A100
baseline derivation in BASELINE.md.

Counts the per-forward FLOPs of the flagship CelebA-64 AuxiliaryUNet
(the DDIM denoiser body; reference: /root/reference/models.py:237-326)
via XLA's HLO cost analysis of the jitted forward, and prints the
derived DDIM-100 per-sample cost together with the implied accelerator
utilizations for the measured TPU number and the A100 estimate.

Runs on CPU (cost analysis is backend-independent for FLOP counts).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force CPU even under the pinned axon env (see CLAUDE.md): env alone is
# overridden by the sitecustomize hook, so also set jax.config below
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import jax.random as jr


def forward_gflops(batch: int = 64) -> tuple:
    """(per-sample forward GFLOPs, param count) of the flagship backbone
    (f32 HLO; multiply-add counted as 2 FLOPs, XLA's convention)."""
    from infodiffusion_tpu.models import InfoDiff

    model = InfoDiff(
        T=1000, a_dim=256, shape=(3, 64, 64), unets_channels=64,
        encoder_channels=64, mmd_weight=0.1, epochs=50,
    )
    x = jnp.zeros((1, 64, 64, 3))
    t0 = jnp.zeros((1,), jnp.int32)
    a0 = jnp.zeros((1, 256))
    rngs = {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
            "reparam": jr.PRNGKey(2), "dropout": jr.PRNGKey(3)}
    variables = jax.jit(lambda: model.init(rngs, x, t0, a0))()
    xb = jnp.zeros((batch, 64, 64, 3))
    tb = jnp.zeros((batch,), jnp.int32)
    ab = jnp.zeros((batch, 256))
    fwd = jax.jit(lambda v, x, t, a: model.apply(v, x, t, a))
    cost = fwd.lower(variables, xb, tb, ab).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    nparams = sum(a.size for a in jax.tree.leaves(variables))
    return cost["flops"] / batch / 1e9, nparams


def train_step_gflops(batch: int = 128) -> float:
    """Per-image FLOPs of the FULL flagship train step (InfoDiff
    composite loss forward + backward + global-norm clip + AdamW), via
    XLA HLO cost analysis of the exact jitted program bench.py's train
    mode times (reference workload: /root/reference/run.py:161-212).
    The basis of BASELINE.md's A100 train denominator."""
    import jax.random as jr

    from infodiffusion_tpu.models import InfoDiff
    from infodiffusion_tpu.train import (
        create_train_state, make_optimizer, make_train_step,
    )

    model = InfoDiff(
        T=1000, a_dim=256, shape=(3, 64, 64), unets_channels=64,
        encoder_channels=64, mmd_weight=0.1, epochs=50,
    )
    x = jnp.zeros((batch, 64, 64, 3))
    tx = make_optimizer(1e-4, 50, 1000)
    state = create_train_state(model, jr.PRNGKey(0), x, tx)
    step = make_train_step(model, tx, donate=False)
    cost = step.lower(state, x, 0).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return cost["flops"] / batch / 1e9


def main():
    gflops, nparams = forward_gflops()
    ddim100_tflop = gflops * 100 / 1e3
    print(f"backbone params:              {nparams / 1e6:.2f} M")
    print(f"forward FLOPs (per sample):   {gflops:.2f} GFLOP")
    print(f"DDIM-100 cost (per sample):   {ddim100_tflop:.3f} TFLOP")
    print()
    # the A100 estimates live in bench.py (single source, pinned by
    # tests/test_scripts.py) — import it with the cache dir restored
    # afterwards (bench repoints it at import, like test_scripts does)
    cache_dir = jax.config.jax_compilation_cache_dir
    try:
        import bench
    finally:
        jax.config.update("jax_compilation_cache_dir", cache_dir)

    a100_sps = bench.A100_DDIM100_EST
    a100_ips = bench.A100_TRAIN_EST
    for label, sps, peak in (
        ("TPU v5e measured 79.7 s/s vs 197 TF/s bf16 peak", 79.7, 197.0),
        (f"A100 estimate    {a100_sps:.1f} s/s vs 156 TF/s TF32 peak",
         a100_sps, 156.0),
    ):
        eff = sps * ddim100_tflop
        print(f"{label}: achieved {eff:6.1f} TF/s = {eff / peak:5.1%}")
    print()
    tg = train_step_gflops()
    print(f"train step FLOPs (per image): {tg:.2f} GFLOP")
    for label, ips, peak in (
        ("TPU v5e measured 1088.5 i/s vs 197 TF/s bf16 peak", 1088.5,
         197.0),
        (f"A100 estimate     {a100_ips:.1f} i/s vs 156 TF/s TF32 peak",
         a100_ips, 156.0),
    ):
        eff = ips * tg / 1e3
        print(f"{label}: achieved {eff:6.1f} TF/s = {eff / peak:5.1%}")


if __name__ == "__main__":
    main()
