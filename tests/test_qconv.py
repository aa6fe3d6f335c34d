"""Fused [GN/FiLM -> SiLU -> int8 quantize -> conv3x3 -> dequant] Pallas
kernel (ops/pallas/qconv.py) + the affine-chain plumbing in nn/blocks.py.

The kernel's math is pinned three ways:
- op level, against ``qconv_reference`` — a plain-XLA oracle implementing
  the IDENTICAL algebra (f32 chain, folded act scales, s32 conv, single
  dequant), so interpret-mode agreement is float-exact;
- the oracle itself against the unquantized f32 chain+conv (the int8
  noise-floor bound);
- model level, against BOTH the f32 forward and the XLA int8 turbo path
  (the two paths differ only by the documented bf16-vs-f32 pre-quantize
  precision divergence, PARITY.md D16).

Kernel runs in interpret mode on CPU (tests/conftest.py forces the CPU
backend); opt-in hardware smokes live in this file under
``INFODIFF_TPU_TESTS=1`` and run in a subprocess on the real TPU —
including the latent_traj a_dim=32/64 Mosaic-compile smoke (ADVICE r2).
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest
from flax import linen as nn

from infodiffusion_tpu.ops.pallas.qconv import (
    _tile_plan,
    fused_qconv_supported,
    qconv_fused,
    qconv_reference,
    use_fused_qconv,
)


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)


def _case(shapes, cout, seed=0):
    ps = [0.5 * jr.normal(jr.PRNGKey(seed + i), s)
          for i, s in enumerate(shapes)]
    ctot = sum(s[-1] for s in shapes)
    B = shapes[0][0]
    A = 1.0 + 0.1 * jr.normal(jr.PRNGKey(seed + 10), (B, ctot))
    Brow = 0.1 * jr.normal(jr.PRNGKey(seed + 11), (B, ctot))
    absmax = jnp.array([float(jnp.max(jnp.abs(p))) * 1.2 for p in ps])
    k = 0.2 * jr.normal(jr.PRNGKey(seed + 12), (3, 3, ctot, cout))
    b = 0.1 * jr.normal(jr.PRNGKey(seed + 13), (cout,))
    return ps, A, Brow, absmax, k, b


@pytest.mark.parametrize(
    "shapes,cout",
    [
        ([(8, 16, 16, 32)], 64),                      # single piece
        ([(8, 8, 8, 64), (8, 8, 8, 32)], 64),          # skip-concat pieces
        ([(16, 32, 32, 64)], 64),                      # multi-row-tile plan
        ([(32, 16, 16, 64), (32, 16, 16, 64)], 128),   # nb>8 plan
    ],
)
def test_kernel_matches_oracle_interpret(shapes, cout):
    """Interpret-mode kernel == the exact-math XLA oracle (same folded
    scales, same f32 chain): agreement is float rounding only."""
    ps, A, Brow, absmax, k, b = _case(shapes, cout)
    out = qconv_fused(ps, A, Brow, absmax, k, b, jnp.float32,
                      interpret=True)
    ref = qconv_reference(ps, A, Brow, absmax, k, b, jnp.float32)
    assert _rel(out, ref) < 1e-6


@pytest.mark.parametrize(
    "shapes,cout",
    [
        ([(8, 16, 16, 32)], 64),
        ([(8, 8, 8, 64), (8, 8, 8, 32)], 64),
        ([(16, 32, 32, 64)], 64),  # multi-tile: the pipeline actually runs
    ],
)
def test_kernel_v2_matches_oracle_interpret(shapes, cout, monkeypatch):
    """The software-pipelined v2 kernel (INFODIFF_QCONV_V2=1,
    double-buffered Xcat + overlapped issue order) is the SAME math as
    v1/the oracle — only the schedule differs."""
    monkeypatch.setenv("INFODIFF_QCONV_V2", "1")
    ps, A, Brow, absmax, k, b = _case(shapes, cout)
    out = qconv_fused(ps, A, Brow, absmax, k, b, jnp.float32,
                      interpret=True)
    ref = qconv_reference(ps, A, Brow, absmax, k, b, jnp.float32)
    assert _rel(out, ref) < 1e-6


def test_oracle_close_to_f32_chain():
    """The oracle (and hence the kernel) tracks the UNQUANTIZED
    silu(x*A+B) -> conv within the int8 noise floor."""
    shapes, cout = [(4, 16, 16, 32), (4, 16, 16, 32)], 64
    ps, A, Brow, _, k, b = _case(shapes, cout)
    # calibrate on the POST-chain values like the real path does
    # (ops/quant.py observes the conv input, i.e. silu(x*A+B))
    o, hs = 0, []
    for p in ps:
        c = p.shape[-1]
        h = p * A[:, None, None, o : o + c] + Brow[:, None, None, o : o + c]
        hs.append(nn.silu(h))
        o += c
    absmax = jnp.array([float(jnp.max(jnp.abs(h))) for h in hs])
    got = qconv_reference(ps, A, Brow, absmax, k, b, jnp.float32)
    x = jnp.concatenate(hs, -1)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    assert _rel(got, ref) < 0.02


def test_affine_rows_reproduce_adagn():
    """group_norm_affine's (A, B) rows collapse GN-apply + stacked FiLMs
    exactly: x*A+B == adagn(x) for single tensors, piece lists (joint
    stats), and dual FiLM."""
    from infodiffusion_tpu.ops.norm import adagn, group_norm_affine
    from infodiffusion_tpu.ops.norm import group_norm_pieces

    x = jr.normal(jr.PRNGKey(0), (2, 8, 8, 64))
    scale = 1.0 + 0.1 * jr.normal(jr.PRNGKey(1), (64,))
    bias = 0.1 * jr.normal(jr.PRNGKey(2), (64,))
    films = [
        (0.1 * jr.normal(jr.PRNGKey(3), (2, 64)),
         0.1 * jr.normal(jr.PRNGKey(4), (2, 64))),
        (0.1 * jr.normal(jr.PRNGKey(5), (2, 64)),
         0.1 * jr.normal(jr.PRNGKey(6), (2, 64))),
    ]
    for f in ([], films[:1], films):
        A, B = group_norm_affine(x, 32, scale, bias, f)
        got = x * A[:, None, None, :] + B[:, None, None, :]
        ref = adagn(x, 32, scale, bias, f)
        np.testing.assert_allclose(
            np.asarray(got, np.float64), np.asarray(ref, np.float64),
            atol=2e-5, rtol=2e-5,
        )
    # pieces: joint stats across the skip concat
    p1 = x[..., :32]
    p2 = 2.0 * jr.normal(jr.PRNGKey(7), (2, 8, 8, 32))
    A, B = group_norm_affine([p1, p2], 32, scale, bias)
    got = jnp.concatenate(
        [p1 * A[:, None, None, :32] + B[:, None, None, :32],
         p2 * A[:, None, None, 32:] + B[:, None, None, 32:]], -1,
    )
    ref = jnp.concatenate(group_norm_pieces([p1, p2], 32, scale, bias), -1)
    np.testing.assert_allclose(
        np.asarray(got, np.float64), np.asarray(ref, np.float64),
        atol=2e-5, rtol=2e-5,
    )


def test_gate_covers_flagship_and_rejects_odd():
    """Every flagship (bench.py: B=128, 64px, ch=64, ch_mult 1,2,2,2)
    conv1/2/3 site must pass the gate — this is what makes the kernel a
    headline lever rather than a toy — and non-lane-aligned / non-NHWC /
    mismatched-piece shapes must fall back."""
    flagship = [
        ([(128, 64, 64, 64)], 64),
        ([(128, 64, 64, 64), (128, 64, 64, 64)], 64),
        ([(128, 32, 32, 128)], 128),
        ([(128, 32, 32, 128), (128, 32, 32, 128)], 128),
        ([(128, 16, 16, 128)], 128),
        ([(128, 8, 8, 128), (128, 8, 8, 128)], 128),
        ([(32, 64, 64, 64)], 64),  # calibration batch
    ]
    for shapes, cout in flagship:
        assert fused_qconv_supported(shapes, cout), (shapes, cout)
        B, H, W = shapes[0][:3]
        ctot = sum(s[-1] for s in shapes)
        nb, th = _tile_plan(B, H, W, ctot, cout)
        assert B % nb == 0 and H % th == 0
    assert not fused_qconv_supported([(128, 64, 64, 3)], 64)    # C%32
    assert not fused_qconv_supported([(128, 64, 64, 64)], 48)   # cout%32
    assert not fused_qconv_supported([(8, 64)], 64)             # 1-D latent
    assert not fused_qconv_supported(
        [(8, 8, 8, 32), (8, 4, 4, 32)], 64                      # mismatched
    )
    assert not fused_qconv_supported([(8, 2, 2, 64)], 64)       # tiny spatial


def test_env_gates(monkeypatch):
    for var in ("INFODIFF_FORCE_FUSED_QCONV", "INFODIFF_ENABLE_FUSED_QCONV",
                "INFODIFF_DISABLE_FUSED_QCONV", "INFODIFF_DISABLE_PALLAS"):
        monkeypatch.delenv(var, raising=False)
    # measured-slower kernel: OPT-IN only (and TPU-only even when enabled)
    assert not use_fused_qconv()
    monkeypatch.setenv("INFODIFF_ENABLE_FUSED_QCONV", "1")
    assert not use_fused_qconv()  # CPU backend: still off
    monkeypatch.delenv("INFODIFF_ENABLE_FUSED_QCONV")
    monkeypatch.setenv("INFODIFF_FORCE_FUSED_QCONV", "1")
    assert use_fused_qconv()
    monkeypatch.setenv("INFODIFF_DISABLE_FUSED_QCONV", "1")
    assert not use_fused_qconv()  # disable wins over force
    monkeypatch.delenv("INFODIFF_DISABLE_FUSED_QCONV")
    monkeypatch.setenv("INFODIFF_DISABLE_PALLAS", "1")
    assert not use_fused_qconv()  # umbrella escape hatch wins too


def test_gnparams_chain_only_when_deterministic(monkeypatch):
    """_GNParams returns an _AffineChain only at (deterministic) apply
    time with the calibration marker present; training-style calls
    (deterministic=False) and marker-less variables get plain arrays."""
    from infodiffusion_tpu.nn.blocks import _AffineChain, _GNParams

    monkeypatch.setenv("INFODIFF_FORCE_FUSED_QCONV", "1")
    m = _GNParams(fused_out_ch=64)
    x = jr.normal(jr.PRNGKey(0), (2, 8, 8, 64))
    v = m.init(jr.PRNGKey(1), x)
    assert "quant" not in v  # init never records markers
    out = m.apply(v, x)
    assert isinstance(out, jnp.ndarray)  # no marker -> plain GN
    vq = {**v, "quant": {"fused_qconv": jnp.ones((), jnp.float32)}}
    chain = m.apply(vq, x, deterministic=True)
    assert isinstance(chain, _AffineChain)
    assert chain.A.shape == (2, 64) and chain.B.shape == (2, 64)
    out2 = m.apply(vq, x, deterministic=False)
    assert isinstance(out2, jnp.ndarray)  # dropout path stays materialized
    monkeypatch.setenv("INFODIFF_DISABLE_FUSED_QCONV", "1")
    out3 = m.apply(vq, x, deterministic=True)
    assert isinstance(out3, jnp.ndarray)  # env kill switch


def _tiny_unet():
    from infodiffusion_tpu.models import AuxiliaryUNet

    return AuxiliaryUNet(
        T=10, a_dim=4, ch=32, ch_mult=(1, 2), attn=(1,), out_ch=1,
    )


@pytest.fixture(scope="module")
def calibrated_unet():
    from infodiffusion_tpu.ops import quant as q8

    model = _tiny_unet()
    x = jr.normal(jr.PRNGKey(7), (2, 16, 16, 1))
    t = jnp.array([3, 7], jnp.int32)
    a = jr.normal(jr.PRNGKey(8), (2, 4))
    v = jax.jit(lambda: model.init(jr.PRNGKey(0), x, t, a))()
    vq = q8.calibrate(model, v, (16, 16, 1), a_dim=4, T=10, batch=8)
    return model, v, vq, (x, t, a)


def test_calibration_records_fused_markers(calibrated_unet):
    """Every ResBlock norm1/2/3 site gets a fused marker at this tiny
    config (all pass the shape gate) — marker sites must match the
    ResBlock conv absmax sites one-for-one (the 2 extra absmax sites are
    the stride-2 resampling convs, which correctly have no marker)."""
    model, v, vq, _ = calibrated_unet
    flat = jax.tree_util.tree_flatten_with_path(vq["quant"])[0]

    import re

    def site(path):  # ('unet','downblock_0','norm1') -> ('unet','downblock_0','1')
        keys = [getattr(k, "key", str(k)) for k in path]
        return tuple(keys[:-2]) + (keys[-2][-1],)  # normN/convN share N

    fused = {
        site(p) for p, _ in flat if "fused_qconv" in str(p)
    }
    res_abs = {
        site(p) for p, _ in flat
        if "act_absmax" in str(p)
        and re.fullmatch(r"conv\d", getattr(p[-2], "key", ""))
    }
    assert fused, "no fused markers recorded"
    assert fused == res_abs, (sorted(fused - res_abs),
                              sorted(res_abs - fused))


def test_model_fused_matches_xla_int8_and_f32(calibrated_unet, monkeypatch):
    """Full tiny-UNet forward with the fused kernel forced (interpret)
    vs (a) the XLA int8 path — differ only by the bf16-vs-f32
    pre-quantize divergence — and (b) the f32 forward — the int8 noise
    bound that also guards the XLA tier (test_quant)."""
    model, v, vq, (x, t, a) = calibrated_unet
    ref_f32 = model.apply(v, x, t, a)
    monkeypatch.setenv("INFODIFF_FORCE_FUSED_QCONV", "1")
    out_fused = model.apply(vq, x, t, a)
    monkeypatch.setenv("INFODIFF_DISABLE_FUSED_QCONV", "1")
    out_xla = model.apply(vq, x, t, a)
    assert _rel(out_fused, out_xla) < 0.08
    assert _rel(out_fused, ref_f32) < 0.15
    assert bool(jnp.all(jnp.isfinite(out_fused)))


def test_int8x_calibration_skips_fused_markers():
    """The int8x tier's residual-read quantization is incompatible with
    handing norm1 an unmaterialized chain (norm1 reads the shared s8
    view), so int8x calibration must not create fused markers."""
    from infodiffusion_tpu.ops import quant as q8

    model = _tiny_unet()
    x = jnp.zeros((1, 16, 16, 1))
    v = jax.jit(
        lambda: model.init(
            jr.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), jnp.zeros((1, 4))
        )
    )()
    vx = q8.calibrate(model, v, (16, 16, 1), a_dim=4, T=10, batch=8,
                      mode="int8x")
    flat = jax.tree_util.tree_flatten_with_path(vx["quant"])[0]
    assert not any("fused_qconv" in str(p) for p, _ in flat)


# --- opt-in hardware smokes (INFODIFF_TPU_TESTS=1): run in a subprocess
# on the real TPU (this process is pinned to CPU by conftest). These are
# the Mosaic-compile guards ADVICE r2 asked for: interpret-mode parity
# cannot catch lowering regressions on the padded sub-128-lane paths.

_TPU = os.environ.get("INFODIFF_TPU_TESTS") == "1"


def _run_on_tpu(code: str) -> str:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    env.pop("INFODIFF_FORCE_FUSED_QCONV", None)
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=1800,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    return out.stdout


@pytest.mark.skipif(not _TPU, reason="INFODIFF_TPU_TESTS=1 only")
def test_qconv_compiles_and_matches_on_tpu():
    out = _run_on_tpu(
        """
import jax, jax.numpy as jnp, jax.random as jr, numpy as np
from infodiffusion_tpu.cache import enable_compilation_cache
enable_compilation_cache()
from infodiffusion_tpu.ops.pallas.qconv import qconv_fused, qconv_reference
assert jax.default_backend() == "tpu"
for shapes, cout in [([(16, 32, 32, 128)], 128),
                     ([(16, 64, 64, 64), (16, 64, 64, 64)], 64)]:
    ps = [0.5 * jr.normal(jr.PRNGKey(i), s) for i, s in enumerate(shapes)]
    ctot = sum(s[-1] for s in shapes); B = shapes[0][0]
    A = 1.0 + 0.1 * jr.normal(jr.PRNGKey(10), (B, ctot))
    Br = 0.1 * jr.normal(jr.PRNGKey(11), (B, ctot))
    am = jnp.array([float(jnp.max(jnp.abs(p))) * 1.2 for p in ps])
    k = 0.2 * jr.normal(jr.PRNGKey(12), (3, 3, ctot, cout))
    b = 0.1 * jr.normal(jr.PRNGKey(13), (cout,))
    got = np.asarray(jax.jit(lambda *a: qconv_fused(
        list(a[:len(ps)]), *a[len(ps):], jnp.float32))(*ps, A, Br, am, k, b),
        np.float64)
    ref = np.asarray(qconv_reference(ps, A, Br, am, k, b, jnp.float32),
                     np.float64)
    r = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert r < 1e-4, (shapes, cout, r)
print("QCONV_TPU_OK")
"""
    )
    assert "QCONV_TPU_OK" in out


@pytest.mark.skipif(not _TPU, reason="INFODIFF_TPU_TESTS=1 only")
def test_latent_traj_small_adim_compiles_on_tpu():
    """ADVICE r2: the relaxed a_dim%32 gate's compile claim, exercised on
    hardware at a_dim=32 and 64 (the padded sub-128-lane shapes that
    motivated the old %128 gate)."""
    out = _run_on_tpu(
        """
import jax, jax.numpy as jnp, jax.random as jr, numpy as np
from infodiffusion_tpu.cache import enable_compilation_cache
enable_compilation_cache()
assert jax.default_backend() == "tpu"
from infodiffusion_tpu.diffusion.samplers import sample_loop
from infodiffusion_tpu.diffusion.schedule import make_schedule
from infodiffusion_tpu.models import Diff
from infodiffusion_tpu.ops.pallas import latent_traj
from infodiffusion_tpu.ops.pallas.latent_mlp import pack_latent_unet_params
for D in (32, 64):
    T, B = 12, 16
    model = Diff(T=T, shape=(1, D, D), is_latent=True)
    rngs = {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
            "dropout": jr.PRNGKey(2)}
    v = jax.jit(lambda: model.init(
        rngs, jnp.zeros((B, D)), jnp.zeros((B,), jnp.int32)))()
    packed = pack_latent_unet_params(v["params"]["backbone"], D)
    sched = make_schedule(1e-5, 1e-2, T)
    xT = jr.normal(jr.PRNGKey(3), (B, D))
    got = np.asarray(latent_traj.latent_trajectory_pallas(
        packed, sched, xT, jr.PRNGKey(4), deterministic=True), np.float64)
    ref = np.asarray(sample_loop(
        lambda x, t, a: model.apply(v, x, t), sched, xT, jr.PRNGKey(4),
        None, deterministic=True), np.float64)
    r = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert r < 5e-3, (D, r)
print("LATENT_TRAJ_TPU_OK")
"""
    )
    assert "LATENT_TRAJ_TPU_OK" in out
