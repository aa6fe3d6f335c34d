"""Whole-trajectory fused latent sampler kernel (ops/pallas/latent_traj.py).

The oracle is the framework's own scan-based samplers (themselves pinned
against the torch reference in test_reference_parity): the kernel
pre-draws noise with exactly sample_loop's key chain, so trajectories
must agree to float tolerance — not just in distribution — for all
three update families (stochastic DDIM eta=0.01, DDPM, reverse
encoding). Kernel runs in interpret mode on CPU.
"""

import functools

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from infodiffusion_tpu.diffusion.samplers import (
    reverse_sample_loop,
    sample_loop,
)
from infodiffusion_tpu.diffusion.schedule import (
    ddim_reverse_step,
    ddim_step,
    ddpm_step,
    make_schedule,
)
from infodiffusion_tpu.models import Diff
from infodiffusion_tpu.ops.pallas import latent_traj
from infodiffusion_tpu.ops.pallas.latent_mlp import pack_latent_unet_params

D, T, B = 64, 24, 16


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)


@pytest.fixture(scope="module")
def setup():
    model = Diff(T=T, shape=(1, D, D), is_latent=True)
    rngs = {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
            "dropout": jr.PRNGKey(2)}
    v = jax.jit(
        lambda: model.init(rngs, jnp.zeros((B, D)), jnp.zeros((B,), jnp.int32))
    )()
    packed = pack_latent_unet_params(v["params"]["backbone"], D)
    sched = make_schedule(1e-5, 1e-2, T)
    xT = jr.normal(jr.PRNGKey(3), (B, D))
    eps_fn = lambda x, t, a: model.apply(v, x, t)
    return model, v, packed, sched, xT, eps_fn


def test_sampling_coefficients_match_step_algebra():
    """The affine factoring (cx, ce, cn) must reproduce ddim_step /
    ddpm_step exactly (up to f32 reassociation) at every timestep,
    including the idx==0 specials."""
    sched = make_schedule(1e-5, 1e-2, 50)
    idxs = jnp.arange(49, -1, -1)
    x = jr.normal(jr.PRNGKey(0), (4, 8))
    eps = jr.normal(jr.PRNGKey(1), (4, 8))
    noise = jr.normal(jr.PRNGKey(2), (4, 8))
    for det, stepper in ((True, ddim_step), (False, ddpm_step)):
        cx, ce, cn = latent_traj.sampling_coefficients(sched, idxs, det)
        for i in (0, 7, 25, 48, 49):  # includes idx==0 (i == 49)
            idx = jnp.full((4,), int(idxs[i]), jnp.int32)
            n = noise
            if not det:
                n = jnp.where(int(idxs[i]) == 0, jnp.zeros_like(noise), noise)
            ref = stepper(sched, x, idx, eps, n)
            got = cx[i] * x + ce[i] * eps + cn[i] * noise
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6
            )


def test_reverse_coefficients_match_step_algebra():
    sched = make_schedule(1e-5, 1e-2, 50)
    idxs = jnp.arange(1, 49)
    cx, ce, _cn = latent_traj.reverse_coefficients(sched, idxs)
    x = jr.normal(jr.PRNGKey(0), (4, 8))
    eps = jr.normal(jr.PRNGKey(1), (4, 8))
    for i in (0, 20, 47):
        idx = jnp.full((4,), int(idxs[i]), jnp.int32)
        ref = ddim_reverse_step(sched, x, idx, eps)
        got = cx[i] * x + ce[i] * eps
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6
        )


@pytest.mark.parametrize("deterministic", [True, False])
def test_trajectory_matches_scan_sampler(setup, deterministic):
    """Same key => same trajectory as sample_loop (the kernel replicates
    its split chain), both DDIM-eta and DDPM."""
    _model, _v, packed, sched, xT, eps_fn = setup
    key = jr.PRNGKey(4)
    ref = sample_loop(eps_fn, sched, xT, key, None,
                      deterministic=deterministic)
    out = latent_traj.latent_trajectory_pallas(
        packed, sched, xT, key, deterministic=deterministic,
        interpret=True, block_b=8,
    )
    assert _rel(out, ref) < 1e-5


def test_trajectory_reverse_matches_scan(setup):
    _model, _v, packed, sched, xT, eps_fn = setup
    ref = reverse_sample_loop(eps_fn, sched, xT, None)
    out = latent_traj.latent_trajectory_pallas(
        packed, sched, xT, jr.PRNGKey(0), deterministic=True,
        reverse=True, interpret=True, block_b=8,
    )
    assert _rel(out, ref) < 1e-5


def test_trajectory_partial_batch_blocks(setup):
    """B not a multiple of block_b: trailing partial block rows must
    still be exact (every row is independent)."""
    _model, _v, packed, sched, xT, eps_fn = setup
    key = jr.PRNGKey(9)
    ref = sample_loop(eps_fn, sched, xT, key, None, deterministic=True)
    out = latent_traj.latent_trajectory_pallas(
        packed, sched, xT, key, deterministic=True,
        interpret=True, block_b=12,  # 16 rows -> blocks of 12 + 4
    )
    assert _rel(out, ref) < 1e-5


def test_noise_injection_parity(setup):
    """Injected noises match sample_loop's noises= contract."""
    _model, _v, packed, sched, xT, eps_fn = setup
    noises = jr.normal(jr.PRNGKey(7), (T, B, D))
    ref = sample_loop(eps_fn, sched, xT, jr.PRNGKey(0), None,
                      deterministic=True, noises=noises)
    out = latent_traj.latent_trajectory_pallas(
        packed, sched, xT, jr.PRNGKey(0), deterministic=True,
        noises=noises, interpret=True, block_b=8,
    )
    assert _rel(out, ref) < 1e-5


def test_tiny_batch_pads_noise_dma(setup):
    """B < 8: the batch tile clamps to 8 and the hand-rolled noise DMA
    must stay in bounds (noises are padded up to the block grid —
    hardware DMAs are not masked like BlockSpec operands)."""
    _model, _v, packed, sched, xT, eps_fn = setup
    key = jr.PRNGKey(5)
    small = xT[:4]
    ref = sample_loop(eps_fn, sched, small, key, None, deterministic=True)
    out = latent_traj.latent_trajectory_pallas(
        packed, sched, small, key, deterministic=True,
        interpret=True, block_b=8,
    )
    assert out.shape == (4, D)
    assert _rel(out, ref) < 1e-5


def test_output_dtype_follows_xT(setup):
    """The kernel path keeps the scan path's dtype contract (the carry
    keeps xT's dtype)."""
    _model, _v, packed, sched, xT, _eps = setup
    out = latent_traj.latent_trajectory_pallas(
        packed, sched, xT.astype(jnp.bfloat16), jr.PRNGKey(0),
        deterministic=True, interpret=True, block_b=8,
    )
    assert out.dtype == jnp.bfloat16


def test_explicit_per_forward_opt_in_outranks_traj(setup, monkeypatch):
    """INFODIFF_ENABLE_FUSED_LATENT=1 must still select the per-forward
    kernel (its documented measurement stays reproducible) even when the
    trajectory kernel would be default-on."""
    from infodiffusion_tpu.config import Config
    from infodiffusion_tpu.diffusion.samplers import LatentDiffusionProcess
    from infodiffusion_tpu.ops.pallas import latent_mlp

    model, v, _packed, _sched, _xT, _eps = setup
    monkeypatch.setattr(latent_traj, "use_fused_latent_traj", lambda: True)
    monkeypatch.setattr(latent_traj, "fused_traj_shapes_ok", lambda d: True)
    monkeypatch.setattr(latent_mlp, "use_fused_latent", lambda: True)
    cfg = Config(model="diff", dataset="celeba", a_dim=D, is_latent=True,
                 deterministic=True, diffusion_steps=T)
    p = LatentDiffusionProcess(cfg, model, v)
    assert p._fused and not p._traj


def test_gating_off_on_cpu():
    """Default gating requires a real TPU backend; the CPU suite must
    never route through the uninterpreted kernel."""
    assert latent_traj.use_fused_latent_traj() is False


def test_shape_gate_rejects_unaligned_a_dim():
    """The state lanes are zero-padded to 128 inside the kernel, so the
    gate only requires the HIDDEN width 4*a_dim to be lane-aligned
    (a_dim % 32 == 0) — which admits every reference config, including
    the a_dim=32 mnist/fmnist scripts that used to fall back to XLA."""
    assert latent_traj.fused_traj_shapes_ok(256)
    assert latent_traj.fused_traj_shapes_ok(128)
    assert latent_traj.fused_traj_shapes_ok(64)
    assert latent_traj.fused_traj_shapes_ok(32)
    assert not latent_traj.fused_traj_shapes_ok(48)  # hidden 192 lanes
    assert not latent_traj.fused_traj_shapes_ok(20)


@pytest.mark.parametrize("deterministic", [True, False])
def test_lane_padded_a_dim_matches_scan(deterministic):
    """a_dim=32 (the reference mnist config): the state/noise/eps lanes
    are zero-padded to 128 inside latent_trajectory_pallas; trajectories
    must still match sample_loop exactly, and the padding must never
    leak into the real lanes."""
    d2 = 32
    model = Diff(T=T, shape=(1, d2, d2), is_latent=True)
    rngs = {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
            "dropout": jr.PRNGKey(2)}
    v = jax.jit(
        lambda: model.init(
            rngs, jnp.zeros((B, d2)), jnp.zeros((B,), jnp.int32)
        )
    )()
    packed = pack_latent_unet_params(v["params"]["backbone"], d2)
    sched = make_schedule(1e-5, 1e-2, T)
    xT = jr.normal(jr.PRNGKey(3), (B, d2))
    eps_fn = lambda x, t, a: model.apply(v, x, t)
    key = jr.PRNGKey(4)
    ref = sample_loop(eps_fn, sched, xT, key, None,
                      deterministic=deterministic)
    out = latent_traj.latent_trajectory_pallas(
        packed, sched, xT, key, deterministic=deterministic,
        interpret=True, block_b=8,
    )
    assert out.shape == (B, d2)
    assert _rel(out, ref) < 1e-5


def test_process_uses_trajectory_kernel(setup, monkeypatch):
    """LatentDiffusionProcess routes sampling/reverse through the
    trajectory kernel when gated on, and matches the XLA process."""
    from infodiffusion_tpu.config import Config
    from infodiffusion_tpu.diffusion.samplers import LatentDiffusionProcess

    model, v, _packed, _sched, xT, _eps = setup
    monkeypatch.setattr(latent_traj, "use_fused_latent_traj", lambda: True)
    # the lane-alignment gate (a_dim % 128) is a REAL-hardware Mosaic
    # constraint; interpret mode has no such limit
    monkeypatch.setattr(latent_traj, "fused_traj_shapes_ok", lambda d: True)
    orig = latent_traj.latent_trajectory_pallas
    monkeypatch.setattr(
        latent_traj, "latent_trajectory_pallas",
        functools.partial(orig, interpret=True, block_b=8),
    )
    cfg = Config(model="diff", dataset="celeba", a_dim=D, is_latent=True,
                 deterministic=True, diffusion_steps=T)
    p = LatentDiffusionProcess(cfg, model, v)
    assert p._traj
    p0 = LatentDiffusionProcess.__new__(LatentDiffusionProcess)
    monkeypatch.setattr(latent_traj, "use_fused_latent_traj", lambda: False)
    p0.__init__(cfg, model, v)
    assert not p0._traj
    key = jr.PRNGKey(11)
    out = p.sampling(key, sampling_number=B)
    ref = p0.sampling(key, sampling_number=B)
    assert _rel(out, ref) < 1e-5
    outr = p.reverse_sampling(xT)
    refr = p0.reverse_sampling(xT)
    assert _rel(outr, refr) < 1e-5


def test_int8_weight_stream_matches_dequant_oracle(setup):
    """quantize_packed_weights (the --turbo int8 latent leg): the kernel
    with the int8 W stream must equal the XLA scan run on the
    DEQUANTIZED weights (same values, so agreement is the usual
    coefficient-reassociation tolerance), and the quantization noise vs
    the f32 trajectory must sit in the W8 noise floor."""
    from infodiffusion_tpu.ops.pallas.latent_mlp import latent_eps_fn

    _model, _v, packed, sched, xT, _eps = setup
    pq = latent_traj.quantize_packed_weights(packed)
    assert pq["W"].dtype == jnp.int8
    assert pq["Wsc"].shape == packed["W"].shape[::2]  # [L, h]
    key = jr.PRNGKey(4)
    pdeq = {**packed,
            "W": pq["W"].astype(jnp.float32) * pq["Wsc"][:, None, :]}
    ref = sample_loop(latent_eps_fn(pdeq, interpret=True), sched, xT, key,
                      None, deterministic=True)
    got = latent_traj.latent_trajectory_pallas(
        pq, sched, xT, key, deterministic=True, interpret=True, block_b=8,
    )
    assert _rel(got, ref) < 1e-3
    full = latent_traj.latent_trajectory_pallas(
        packed, sched, xT, key, deterministic=True, interpret=True,
        block_b=8,
    )
    assert _rel(got, full) < 0.02  # whole-trajectory W8 noise floor
    # reverse (encode) path carries the stream too
    rev_q = latent_traj.latent_trajectory_pallas(
        pq, sched, xT, None, deterministic=True, reverse=True,
        interpret=True, block_b=8,
    )
    rev = latent_traj.latent_trajectory_pallas(
        packed, sched, xT, None, deterministic=True, reverse=True,
        interpret=True, block_b=8,
    )
    assert _rel(rev_q, rev) < 0.02


def test_process_turbo_quantizes_weight_stream(setup, monkeypatch):
    """LatentDiffusionProcess under --turbo int8 + active trajectory
    kernel packs int8 weights; without the kernel it warns and stays
    bf16."""
    import warnings as _warnings

    from infodiffusion_tpu.config import Config
    from infodiffusion_tpu.diffusion.samplers import LatentDiffusionProcess

    model, v, _packed, _sched, _xT, _eps = setup
    cfg = Config(model="diff", dataset="celeba", a_dim=D, is_latent=True,
                 deterministic=True, diffusion_steps=T, turbo="int8")
    monkeypatch.setattr(latent_traj, "use_fused_latent_traj", lambda: True)
    monkeypatch.setattr(latent_traj, "fused_traj_shapes_ok", lambda d: True)
    orig = latent_traj.latent_trajectory_pallas
    monkeypatch.setattr(
        latent_traj, "latent_trajectory_pallas",
        functools.partial(orig, interpret=True, block_b=8),
    )
    p = LatentDiffusionProcess(cfg, model, v)
    assert p._traj and p.turbo == "int8"
    assert p.params["W"].dtype == jnp.int8 and "Wsc" in p.params
    out = p.sampling(jr.PRNGKey(11), sampling_number=B)
    assert out.shape == (B, D) and bool(jnp.all(jnp.isfinite(out)))
    # bf16 parity at the product level
    p0 = LatentDiffusionProcess(cfg.replace(turbo="off"), model, v)
    ref = p0.sampling(jr.PRNGKey(11), sampling_number=B)
    assert _rel(out, ref) < 0.02
    # no trajectory kernel -> warn, params untouched
    monkeypatch.setattr(latent_traj, "use_fused_latent_traj", lambda: False)
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        pw = LatentDiffusionProcess(cfg, model, v)
    assert any("turbo" in str(x.message) for x in w)
    assert "params" in pw.params  # raw variables, not a packed dict
