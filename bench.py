#!/usr/bin/env python
"""Headline benchmark: DDIM-100 sampling throughput on the flagship
InfoDiffusion model (CelebA-64 canonical config: AuxiliaryUNet ch=64,
ch_mult=[1,2,2,2], a_dim=256, T=1000 — BASELINE.md), one chip.

Prints ONE JSON line. By default (INFODIFF_TURBO unset) the headline
run measures BOTH inference tiers and reports the fastest honest
configuration — the opt-in int8 turbo tier (ops/quant.py, PARITY.md
D16: W8A8 conv bodies, near-pixel parity, the reference has no
quantized path at all) — with the bf16 parity-precision series
embedded in the same line so the round-over-round trend stays fully
comparable:
  {"metric": "ddim100_samples_per_sec_int8turbo", "value": N,
   "unit": "samples/s", "vs_baseline": N / A100_EST,
   "bf16_parity": {"value": M, "vs_baseline": M / A100_EST}}
Set INFODIFF_TURBO explicitly to pin ONE tier ("" = bf16 only — the
round-1 behavior; "int8"/"int8x" = that tier only); explicit runs emit
the single-tier line with the tier-suffixed metric name.

vs_baseline scaling: the reference publishes no numbers (BASELINE.md) and
always samples the full T=1000 grid host-driven. A100_DDIM100_EST is an
*estimate* of a PyTorch DDIM-100 sampler for this UNet on one A100
(13.6M-param backbone, 14.9 GFLOP/forward, eager fp32+TF32, batch 64):
~30 samples/s = ~29% of the A100 TF32 peak. Full derivation with sources
in BASELINE.md ("Derivation of the A100 DDIM-100 denominator");
reproduce the FLOP accounting with tools/flops_report.py. The estimate
is fixed across rounds so the trend is comparable; the >=5x north-star
(BASELINE.json) therefore means >=150 samples/s.

The dual-tier turbo record additionally carries ``vs_a100_int8`` — the
turbo number scaled by A100_INT8_EST, a PRECISION-MATCHED denominator
(what a TensorRT-class int8 engine for this UNet would do on one A100;
derivation in BASELINE.md). ``vs_baseline`` stays scaled by the fixed
TF32-eager estimate so the cross-round trend is comparable; the matched
ratio is there so the quantized tier is never mistaken for progress
against a full-precision baseline.

Env knobs: INFODIFF_BENCH_BATCH (default 128), INFODIFF_BENCH_STEPS (100),
INFODIFF_BENCH_REPS (3), INFODIFF_BENCH_BF16 (default 1),
INFODIFF_BENCH_MODE selects secondary metrics (not the headline line the
driver records): train (train imgs/sec/chip), latent (latent-DDIM
latents/sec), encode (Encoder imgs/sec — the save_latent workhorse),
fid (InceptionV3 FID-feature imgs/sec — the eval_fid scoring pass).
INFODIFF_BENCH_SIZE applies to the headline, train and encode modes
(latent/fid are resolution-independent). Non-64px sizes emit a
size-suffixed metric name with ``vs_baseline: null`` (the A100
estimates are defined at 64px only); the dual-tier default applies at
EVERY size since round 4 — the round-3 64px-only gate rested on a
b32-confounded 128px sweep (int8 7.30 vs bf16 8.66), and the full-batch
re-sweep reversed it (b128: int8 16.27 vs bf16 14.94, +8.9% — turbo is
the faster tier at 128px too; full table in STATUS.md round 4).

The line's schema is FROZEN (round 2 renamed the default headline from
``ddim100_samples_per_sec`` to ``ddim100_samples_per_sec_int8turbo``
when the dual-tier default landed — BASELINE.md records the rename);
tests/test_scripts.py guards the record builders below against drift.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import jax.random as jr

from infodiffusion_tpu.cache import enable_compilation_cache

enable_compilation_cache()

A100_DDIM100_EST = 30.0  # samples/s, documented estimate (see module doc)

#: precision-MATCHED denominator for the int8 turbo tier: a TensorRT-class
#: int8 engine for this UNet on one A100 (int8 peak 624 TOP/s, ~30%
#: achievable at these shapes => ~187 TF/s / 1.49 TFLOP-per-sample ~= 125
#: samples/s; full derivation in BASELINE.md "A100 int8 denominator").
#: Used only for the turbo record's vs_a100_int8 field — vs_baseline stays
#: scaled by the fixed TF32-eager estimate for cross-round continuity.
A100_INT8_EST = 125.0

#: A100 eager-torch TRAIN estimate for the same workload (79.8
#: GFLOP/image from tools/flops_report.py, TF32 peak, ~21% eager
#: training utilization — the sampler's 29% scaled by our own measured
#: train/sampler MFU ratio; derivation in BASELINE.md "A100 train
#: denominator"). Defined at the 64px flagship only; fixed across
#: rounds.
A100_TRAIN_EST = 420.0


def vs_base(sps, size):
    """vs_baseline ratio; defined at the 64px flagship config only."""
    return round(sps / A100_DDIM100_EST, 3) if size == 64 else None


def resolve_bench_turbo():
    """INFODIFF_TURBO for bench modes: None = unset (dual-tier default
    where supported), '' = pinned bf16, 'int8'/'int8x' = that tier.
    'off' maps to '' — the documented way to defeat an exported
    INFODIFF_TURBO (samplers._resolve_turbo); unknown names raise so a
    typo never mislabels the metric after a tier that does not exist."""
    from infodiffusion_tpu.ops.quant import MODES

    turbo = os.environ.get("INFODIFF_TURBO")
    if turbo == "off":
        turbo = ""
    if turbo is not None and turbo not in ("",) + MODES:
        raise SystemExit(
            f"unknown INFODIFF_TURBO {turbo!r} (expected '', 'off' or "
            f"one of {MODES})"
        )
    return turbo


def dual_tier_record(turbo_sps, bf16_sps, size=64):
    """The FROZEN default-headline schema (INFODIFF_TURBO unset):
    int8 turbo as the value, bf16 parity as a sub-object, plus (at the
    64px flagship) the precision-matched vs_a100_int8 ratio
    (schema-guarded in tests/test_scripts.py — extend, don't rename).
    Non-64px sizes get the size-suffixed name and null ratios (the A100
    estimates are 64px-only); the dual-tier shape itself is
    size-independent since round 4 (module docstring)."""
    metric = (
        "ddim100_samples_per_sec_int8turbo"
        if size == 64
        else f"ddim100_samples_per_sec_{size}px_int8turbo"
    )
    rec = {
        "metric": metric,
        "value": round(turbo_sps, 3),
        "unit": "samples/s",
        "vs_baseline": vs_base(turbo_sps, size),
        "bf16_parity": {
            "value": round(bf16_sps, 3),
            "vs_baseline": vs_base(bf16_sps, size),
        },
    }
    if size == 64:
        rec["vs_a100_int8"] = round(turbo_sps / A100_INT8_EST, 3)
    return rec


def single_tier_record(sps, turbo, size):
    """Pinned-tier / non-64px record (INFODIFF_TURBO set or
    INFODIFF_BENCH_SIZE != 64): one tier, tier/size-suffixed metric."""
    metric = (
        "ddim100_samples_per_sec"
        if size == 64
        else f"ddim100_samples_per_sec_{size}px"
    )
    if turbo:
        metric += f"_{turbo}turbo"
    rec = {
        "metric": metric,
        "value": round(sps, 3),
        "unit": "samples/s",
        "vs_baseline": vs_base(sps, size),
    }
    if turbo == "int8" and size == 64:
        rec["vs_a100_int8"] = round(sps / A100_INT8_EST, 3)
    return rec


def train_main():
    """Secondary metric: flagship train-step throughput (imgs/sec/chip)."""
    import jax.numpy as jnp
    import jax.random as jr

    from infodiffusion_tpu.models import InfoDiff
    from infodiffusion_tpu.train import (
        create_train_state, make_optimizer, make_train_step,
    )

    batch = int(os.environ.get("INFODIFF_BENCH_BATCH", "128"))
    reps = int(os.environ.get("INFODIFF_BENCH_REPS", "20"))
    use_bf16 = os.environ.get("INFODIFF_BENCH_BF16", "1") == "1"
    size = int(os.environ.get("INFODIFF_BENCH_SIZE", "64"))
    dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    model = InfoDiff(
        T=1000, a_dim=256, shape=(3, size, size), unets_channels=64,
        encoder_channels=64, mmd_weight=0.1, epochs=50, dtype=dtype,
    )
    x = jr.normal(jr.PRNGKey(0), (batch, size, size, 3))
    tx = make_optimizer(1e-4, 50, 1000)
    state = create_train_state(model, jr.PRNGKey(0), x, tx)
    step = make_train_step(model, tx, donate=True)
    state, m = step(state, x, 0)
    float(m["loss"])  # compile + warmup (host fetch = reliable sync)
    t0 = time.perf_counter()
    for _ in range(reps):
        state, m = step(state, x, 0)
    # sync via value fetch: block_until_ready can return early through
    # the remote-dispatch tunnel (see CLAUDE.md timing trap)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / reps
    ips = batch / dt
    print(
        json.dumps(
            {
                "metric": (
                    "celeba64_train_imgs_per_sec_per_chip"
                    if size == 64
                    else f"celeba_train_imgs_per_sec_per_chip_{size}px"
                ),
                "value": round(ips, 3),
                "unit": "imgs/s",
                # A100 eager-train estimate (BASELINE.md "A100 train
                # denominator"); defined at the 64px flagship only
                "vs_baseline": (
                    round(ips / A100_TRAIN_EST, 3) if size == 64 else None
                ),
            }
        )
    )


def latent_main():
    """Secondary metric: latent-DDIM sampling throughput (T=1000 full
    grid, flagship a_dim=256) through LatentDiffusionProcess. On TPU
    the whole-trajectory fused Pallas kernel is the default
    (ops/pallas/latent_traj.py — measured +16% over the XLA scan);
    INFODIFF_DISABLE_FUSED_LATENT_TRAJ=1 reverts to the XLA scan, and
    INFODIFF_ENABLE_FUSED_LATENT=1 selects the older per-forward fused
    kernel (~10% behind XLA; it outranks the trajectory default so its
    documented measurement stays reproducible)."""
    from infodiffusion_tpu.config import Config
    from infodiffusion_tpu.diffusion.samplers import LatentDiffusionProcess
    from infodiffusion_tpu.models import Diff

    batch = int(os.environ.get("INFODIFF_BENCH_BATCH", "256"))
    reps = int(os.environ.get("INFODIFF_BENCH_REPS", "3"))
    d = 256
    cfg = Config(
        model="diff", mode="eval_fid", prior="regular", a_dim=d,
        dataset="celeba", deterministic=True, is_latent=True,
    )
    model = Diff(T=1000, shape=(1, d, d), is_latent=True,
                 dtype=jnp.bfloat16)
    rngs = {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
            "dropout": jr.PRNGKey(2)}
    v = jax.jit(
        lambda: model.init(rngs, jnp.zeros((batch, d)),
                           jnp.zeros((batch,), jnp.int32))
    )()
    p = LatentDiffusionProcess(cfg, model, v)
    key = jr.PRNGKey(0)
    out = p.sampling(key, sampling_number=batch)
    float(jnp.mean(out))
    times = []
    for i in range(reps):
        k = jr.fold_in(key, i)
        t0 = time.perf_counter()
        out = p.sampling(k, sampling_number=batch)
        float(jnp.mean(out))  # value fetch = reliable sync (see main())
        times.append(time.perf_counter() - t0)
    lps = batch / min(times)
    # INFODIFF_TURBO=int8 quantizes the trajectory kernel's weight
    # stream (samplers.py wires it through _resolve_turbo); tier-suffix
    # the metric so the two series never mix
    tier = f"_{p.turbo}turbo" if (p.turbo and p._traj) else ""
    print(
        json.dumps(
            {
                "metric": f"latent_ddim1000_latents_per_sec{tier}",
                "value": round(lps, 1),
                "unit": "latents/s",
                "vs_baseline": None,
            }
        )
    )


def encode_main():
    """Secondary metric: deterministic encode throughput (the
    save_latent workhorse: full-UNet Encoder forward, reference:
    run.py:415-443)."""
    from infodiffusion_tpu.models import InfoDiff

    batch = int(os.environ.get("INFODIFF_BENCH_BATCH", "256"))
    reps = int(os.environ.get("INFODIFF_BENCH_REPS", "10"))
    size = int(os.environ.get("INFODIFF_BENCH_SIZE", "64"))
    model = InfoDiff(
        T=1000, a_dim=256, shape=(3, size, size), unets_channels=64,
        encoder_channels=64, mmd_weight=0.1, epochs=50,
        dtype=jnp.bfloat16,
    )
    x0 = jnp.zeros((1, size, size, 3))
    rngs = {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
            "reparam": jr.PRNGKey(2), "dropout": jr.PRNGKey(3)}
    # init through loss_fn: the __call__ path alone does not
    # materialize the encoder subtree (cf. runner._load_model_params)
    variables = jax.jit(
        lambda: model.init(rngs, x0, 0, method=type(model).loss_fn)
    )()

    @jax.jit
    def enc(variables, x):
        a, _aq, mu, _lv = model.apply(
            variables, x, method=type(model).encode, sample=False
        )
        return jnp.float32(jnp.mean(a) + jnp.mean(mu))

    key = jr.PRNGKey(0)
    x = jr.normal(key, (batch, size, size, 3))
    # INFODIFF_TURBO=int8 runs the Encoder conv bodies W8A8 (the same
    # collection-presence switch the samplers use; runner._encoder_quant
    # is the product path); 'off' = explicit bf16, like _resolve_turbo
    turbo = resolve_bench_turbo() or ""
    if turbo:
        from infodiffusion_tpu.ops.quant import calibrate_encoder

        quant = calibrate_encoder(model, variables, x=x[:32], mode=turbo)
        variables = {**variables, "quant": quant}
    float(enc(variables, x))
    times = []
    for i in range(reps):
        xi = x + jnp.float32(i) * 1e-6
        t0 = time.perf_counter()
        v = float(enc(variables, xi))
        times.append(time.perf_counter() - t0)
    ips = batch / min(times)
    metric = (
        "encode_imgs_per_sec"
        if size == 64
        else f"encode_imgs_per_sec_{size}px"
    )
    if turbo:
        metric += f"_{turbo}turbo"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(ips, 1),
                "unit": "imgs/s",
                "vs_baseline": None,
            }
        )
    )


def fid_main():
    """Secondary metric: InceptionV3 FID-feature throughput (the 10k-image
    eval_fid scoring pass; metrics/inception.py jitted on TPU). Weight
    values don't affect throughput, so random weights with the real
    architecture shapes are benchmarked (no checkpoint needed)."""
    import numpy as np

    from infodiffusion_tpu.metrics import inception as inc

    batch = int(os.environ.get("INFODIFF_BENCH_BATCH", "64"))
    reps = int(os.environ.get("INFODIFF_BENCH_REPS", "10"))
    rng = np.random.RandomState(0)
    params = {
        name: (
            (rng.randn(kh, kw, cin, cout) * np.sqrt(2.0 / (kh * kw * cin)))
            .astype(np.float32),
            np.zeros((cout,), np.float32),
        )
        for name, cin, cout, (kh, kw), _s, _p in inc.conv_specs()
    }
    # params as jit ARGUMENTS, on device once (CLAUDE.md benchmark trap 1:
    # closure-constant weights disable XLA layout/donation handling)
    params = jax.tree.map(jax.device_put, params)
    fwd = jax.jit(inc.forward)
    x = jr.uniform(jr.PRNGKey(0), (batch, inc.INPUT_SIZE, inc.INPUT_SIZE, 3))
    float(jnp.mean(fwd(params, x)))
    times = []
    for i in range(reps):
        xi = x + jnp.float32(i) * 1e-6
        t0 = time.perf_counter()
        # value fetch = reliable sync (see main())
        float(jnp.mean(fwd(params, xi)))
        times.append(time.perf_counter() - t0)
    ips = batch / min(times)
    print(
        json.dumps(
            {
                "metric": "inception_fid_features_imgs_per_sec",
                "value": round(ips, 1),
                "unit": "imgs/s",
                "vs_baseline": None,
            }
        )
    )


def main():
    if os.environ.get("INFODIFF_BENCH_MODE") == "train":
        return train_main()
    if os.environ.get("INFODIFF_BENCH_MODE") == "latent":
        return latent_main()
    if os.environ.get("INFODIFF_BENCH_MODE") == "encode":
        return encode_main()
    if os.environ.get("INFODIFF_BENCH_MODE") == "fid":
        return fid_main()
    batch = int(os.environ.get("INFODIFF_BENCH_BATCH", "128"))
    steps = int(os.environ.get("INFODIFF_BENCH_STEPS", "100"))
    reps = int(os.environ.get("INFODIFF_BENCH_REPS", "3"))
    use_bf16 = os.environ.get("INFODIFF_BENCH_BF16", "1") == "1"
    # INFODIFF_BENCH_SIZE: image resolution (default 64 = the flagship
    # CelebA config the driver records; e.g. 128 for the
    # beyond-reference-scale datapoint)
    size = int(os.environ.get("INFODIFF_BENCH_SIZE", "64"))

    from infodiffusion_tpu.diffusion import make_schedule, strided_ddim_loop
    from infodiffusion_tpu.models import InfoDiff

    dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    model = InfoDiff(
        T=1000, a_dim=256, shape=(3, size, size), unets_channels=64,
        encoder_channels=64, mmd_weight=0.1, epochs=50, dtype=dtype,
    )
    x = jnp.zeros((1, size, size, 3))
    t0 = jnp.zeros((1,), jnp.int32)
    a0 = jnp.zeros((1, 256))
    rngs = {
        "params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
        "reparam": jr.PRNGKey(2), "dropout": jr.PRNGKey(3),
    }
    # INFODIFF_TURBO pins one tier ("" = bf16 parity, "int8"/"int8x" =
    # that tier, each with a tier-suffixed metric name). UNSET = the
    # default dual-tier headline: bf16 parity + int8 turbo in one line
    # (module docstring), at every size since the round-4 128px
    # full-batch re-sweep. Resolved before the (expensive) model init
    # so a typo fails fast.
    turbo_env = resolve_bench_turbo()
    base_variables = jax.jit(lambda: model.init(rngs, x, t0, a0))()
    sched = make_schedule(1e-5, 1e-2, 1000)

    def eps_fn(variables):
        return lambda x, t, a: model.apply(variables, x, t, a)

    @jax.jit
    def sample(variables, xT, a, key):
        return strided_ddim_loop(
            eps_fn(variables), sched, xT, key, a, num_steps=steps
        )

    key = jr.PRNGKey(0)
    # carry stays f32 (schedule math is f32 by design); the model's
    # bf16 policy casts activations internally
    xT = jr.normal(key, (batch, size, size, 3))
    a = jr.normal(key, (batch, 256))

    def measure(tier):
        """Best-of-reps samples/s for one inference tier ('' = bf16)."""
        variables = base_variables
        if tier:
            from infodiffusion_tpu.ops.quant import calibrate

            variables = calibrate(
                model, variables, (size, size, 3), a_dim=256, T=1000,
                mode=tier,
            )
        # compile + warmup
        float(jnp.mean(sample(variables, xT, a, key)))
        times = []
        for i in range(reps):
            k = jr.fold_in(key, i)
            t_start = time.perf_counter()
            out = sample(variables, xT, a, k)
            # value fetch = reliable completion barrier over the tunnel
            # (~10ms, <1% of a rep); block_until_ready alone can no-op
            float(jnp.mean(out))
            times.append(time.perf_counter() - t_start)
        return batch / min(times)

    if turbo_env is None:
        # default headline: both tiers, one line — turbo (the framework's
        # fastest honest inference configuration; near-pixel parity,
        # PARITY.md D16) is the value, the bf16 parity-precision series
        # rides along so the trend stays comparable round over round
        bf16_sps = measure("")
        turbo_sps = measure("int8")
        print(json.dumps(dual_tier_record(turbo_sps, bf16_sps, size)))
        return

    turbo = turbo_env or ""
    sps = measure(turbo)
    # non-64px runs get their own metric name and no vs_baseline: the
    # headline series (and the A100 estimate it is scaled against) is
    # defined at the 64px flagship config only
    print(json.dumps(single_tier_record(sps, turbo, size)))


if __name__ == "__main__":
    main()
