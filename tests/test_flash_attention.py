"""Flash-style large-N attention kernel: interpret-mode parity vs the
XLA einsum path, q-tiling correctness, envelope fallbacks, and the
dispatch gate (ops/pallas/flash_attention.py; reference workload:
modules.py:145-164 AttnBlock at the 256px N=4096 grids)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from infodiffusion_tpu.ops.attention import _attention_xla
from infodiffusion_tpu.ops.pallas import flash_attention as fa
from infodiffusion_tpu.ops.pallas.flash_attention import (
    _pick_block_q,
    flash_attention,
    flash_enabled,
    flash_min_tokens,
)


def _qkv(rng, B, N, C, dtype=jnp.float32):
    mk = lambda: jnp.asarray(rng.randn(B, N, C), dtype)
    return mk(), mk(), mk()


@pytest.mark.parametrize("N,C", [(256, 32), (1024, 128), (512, 64)])
def test_flash_interpret_matches_xla_f32(N, C):
    rng = np.random.RandomState(0)
    q, k, v = _qkv(rng, 2, N, C)
    got = flash_attention(q, k, v, interpret=True)
    want = _attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_interpret_matches_xla_bf16():
    rng = np.random.RandomState(1)
    q, k, v = _qkv(rng, 2, 512, 128, jnp.bfloat16)
    got = flash_attention(q, k, v, interpret=True)
    want = _attention_xla(q, k, v)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_flash_q_tiling_matches_untiled():
    """Multiple q tiles per batch element must agree with one big tile
    (the softmax row is complete either way)."""
    rng = np.random.RandomState(2)
    q, k, v = _qkv(rng, 2, 256, 64)
    tiled = flash_attention(q, k, v, block_q=32, interpret=True)
    whole = flash_attention(q, k, v, block_q=256, interpret=True)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(whole),
                               atol=2e-5, rtol=2e-5)


def test_pick_block_q_budget_and_divisibility():
    # N=4096: 512*4096*4 = 8 MB > 4 MB budget -> halves to 256
    assert _pick_block_q(4096, 128) == 256
    # small N: the whole thing in one tile
    assert _pick_block_q(256, 128) == 256
    # N=16384 strip: 64*16384*4 = 4 MB exactly
    assert _pick_block_q(16384, 128) == 64


def test_flash_envelope_fallbacks():
    rng = np.random.RandomState(3)
    # the measured 512px edge: N=16384 C=128 bf16 plans at 16.06 MB
    # against the 16 MB scoped-VMEM core limit (k/v double-buffer
    # across the batch grid dim) — the whole-k/v plan must refuse
    # BEFORE Mosaic OOMs (flash_attention then routes these shapes to
    # the streaming online variant, covered by the routing test)
    with pytest.raises(NotImplementedError):
        fa._check_envelope(jnp.zeros((1, 16384, 128), jnp.bfloat16),
                           fa._pick_block_q(16384, 128))
    with pytest.raises(NotImplementedError):
        fa._check_envelope(jnp.zeros((1, 32768, 64), jnp.float32),
                           fa._pick_block_q(32768, 64))
    # N=8192 bf16 (plan ~12.1 MB) stays inside the envelope
    fa._check_envelope(jnp.zeros((1, 8192, 128), jnp.bfloat16),
                       fa._pick_block_q(8192, 128))
    # indivisible token count
    q, k, v = _qkv(rng, 1, 96, 32)
    with pytest.raises(NotImplementedError):
        flash_attention(q, k, v, block_q=64, interpret=True)


def test_flash_gate(monkeypatch):
    monkeypatch.delenv("INFODIFF_DISABLE_FLASH_ATTENTION", raising=False)
    monkeypatch.delenv("INFODIFF_FLASH_ATTN_MIN_TOKENS", raising=False)
    # below threshold: never
    assert not flash_enabled(flash_min_tokens() - 1)
    # disable flag wins regardless of backend
    monkeypatch.setenv("INFODIFF_DISABLE_FLASH_ATTENTION", "1")
    assert not flash_enabled(1 << 20)
    monkeypatch.delenv("INFODIFF_DISABLE_FLASH_ATTENTION")
    # threshold override
    monkeypatch.setenv("INFODIFF_FLASH_ATTN_MIN_TOKENS", "128")
    assert flash_min_tokens() == 128
    # at/above threshold the gate is backend-dependent (False on the
    # CPU test backend, True on TPU — the TPU smoke covers that leg)
    import jax

    expect = jax.default_backend() == "tpu"
    assert flash_enabled(128) == expect


def _grad_scalar(attn_fn, q, k, v, **kw):
    """A scalar that exercises every output element with a non-uniform
    cotangent, so grad errors can't cancel."""

    def loss(q_, k_, v_):
        out = attn_fn(q_, k_, v_, **kw)
        w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)
        return jnp.sum(out.astype(jnp.float32) * jnp.sin(w))

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


@pytest.mark.parametrize("N,C,bq", [(256, 64, 64), (512, 128, None)])
def test_flash_grads_match_xla_f32(N, C, bq):
    """The custom_vjp backward kernel (recompute-style flash VJP) vs
    jax autodiff through the dense XLA path — the round-4 VERDICT
    defect: training graphs at N>=512 route the forward through this
    kernel, so its gradients must be XLA-parity."""
    rng = np.random.RandomState(10)
    q, k, v = _qkv(rng, 2, N, C)
    kw = {"interpret": True}
    if bq is not None:
        kw["block_q"] = bq
    got = _grad_scalar(flash_attention, q, k, v, **kw)
    want = _grad_scalar(_attention_xla, q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-4, rtol=5e-4,
            err_msg=f"d{name} mismatch",
        )


def test_flash_grads_match_xla_bf16():
    rng = np.random.RandomState(11)
    q, k, v = _qkv(rng, 2, 512, 128, jnp.bfloat16)
    got = _grad_scalar(flash_attention, q, k, v, interpret=True)
    want = _grad_scalar(_attention_xla, q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        assert g.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w, np.float32),
            atol=0.15, rtol=0.1, err_msg=f"d{name} mismatch",
        )


def test_flash_grads_tile_invariant():
    """dk/dv accumulate across q tiles; more tiles must not change the
    gradient. block_q here only varies the FORWARD tiling (the VJP
    re-picks its own tile) — the backward's multi-tile accumulation is
    exercised directly in test_flash_bwd_multi_tile_accumulation."""
    rng = np.random.RandomState(12)
    q, k, v = _qkv(rng, 2, 256, 64)
    tiled = _grad_scalar(flash_attention, q, k, v, block_q=32,
                         interpret=True)
    whole = _grad_scalar(flash_attention, q, k, v, block_q=256,
                         interpret=True)
    for g_t, g_w in zip(tiled, whole):
        np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_w),
                                   atol=2e-5, rtol=2e-5)


def test_flash_bwd_multi_tile_accumulation():
    """The riskiest mechanism in the backward kernel — the
    pl.when(i==0) zero-init + revisited-block `+=` accumulation of
    dk/dv across q tiles — exercised with FORCED multi-tile backward
    tilings (the automatic picker chooses one tile at CPU-test shapes,
    so without the override this path would only run in the opt-in
    hardware smoke)."""
    rng = np.random.RandomState(15)
    q, k, v = _qkv(rng, 2, 256, 64)
    do = jnp.asarray(rng.randn(2, 256, 64), jnp.float32)
    whole = fa._bwd_call(q, k, v, do, interpret=True, block_q=256)
    for bq in (32, 64, 128):
        tiled = fa._bwd_call(q, k, v, do, interpret=True, block_q=bq)
        for g_t, g_w, name in zip(tiled, whole, ("dq", "dk", "dv")):
            np.testing.assert_allclose(
                np.asarray(g_t), np.asarray(g_w), atol=2e-5, rtol=2e-5,
                err_msg=f"{name} differs at block_q={bq}",
            )
    # and against the dense-XLA gradient, not just self-consistency
    dense = fa._dense_vjp(q, k, v, do)
    for g_t, g_d in zip(fa._bwd_call(q, k, v, do, interpret=True,
                                     block_q=32), dense):
        np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_d),
                                   atol=5e-4, rtol=5e-4)


def test_flash_bwd_envelope_falls_back_dense(monkeypatch):
    """Outside the backward accumulator budget the VJP silently uses
    the dense XLA gradient — still correct, just logits-in-HBM."""
    rng = np.random.RandomState(13)
    q, k, v = _qkv(rng, 1, 256, 64)
    calls = {"pallas_bwd": 0}
    real = fa._bwd_call

    def counting(*a, **kw):
        calls["pallas_bwd"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(fa, "_bwd_call", counting)
    monkeypatch.setattr(fa, "_ACC_BUDGET", 1)  # force the fallback
    got = _grad_scalar(flash_attention, q, k, v, interpret=True)
    want = _grad_scalar(_attention_xla, q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=5e-4, rtol=5e-4)
    assert calls["pallas_bwd"] == 1  # tried the kernel, then fell back


def test_mesh_compute_scope_tracks_mesh_size():
    import numpy as _np
    from jax.sharding import Mesh

    from infodiffusion_tpu.ops.gating import (
        active_mesh_size, mesh_compute_scope,
    )

    assert active_mesh_size() == 1
    mesh1 = Mesh(_np.asarray(jax.devices()[:1]), ("data",))
    with mesh_compute_scope(mesh1):
        assert active_mesh_size() == 1  # 1-device mesh is trivial
    if jax.device_count() >= 8:
        meshN = Mesh(_np.asarray(jax.devices()).reshape(4, 2),
                     ("data", "model"))
        with mesh_compute_scope(meshN):
            assert active_mesh_size() == 8
            with mesh_compute_scope(None):  # nested scope overrides
                assert active_mesh_size() == 1
            assert active_mesh_size() == 8
    assert active_mesh_size() == 1  # scopes restore


def test_flash_gate_refuses_under_mesh(monkeypatch):
    """Round-4 advisor finding: a pallas_call under a GSPMD-sharded jit
    is unvalidated, so the gate must refuse while a non-trivial mesh
    scope is active (sharded samplers / the dp train loop set one).
    The backend check is monkeypatched to 'tpu' so the mesh refusal is
    what's actually being observed (on the CPU suite backend the gate
    would return False either way)."""
    import numpy as _np
    from jax.sharding import Mesh

    import infodiffusion_tpu.ops.pallas.flash_attention as fa_mod
    from infodiffusion_tpu.ops.gating import mesh_compute_scope

    monkeypatch.delenv("INFODIFF_DISABLE_FLASH_ATTENTION", raising=False)
    monkeypatch.setenv("INFODIFF_FLASH_ATTN_MIN_TOKENS", "128")
    monkeypatch.setattr(fa_mod.jax, "default_backend", lambda: "tpu")
    assert flash_enabled(1024)
    mesh1 = Mesh(_np.asarray(jax.devices()[:1]), ("data",))
    with mesh_compute_scope(mesh1):  # 1-device mesh is trivial
        assert flash_enabled(1024)
    if jax.device_count() > 1:
        meshN = Mesh(_np.asarray(jax.devices()), ("data",))
        with mesh_compute_scope(meshN):
            assert not flash_enabled(1024)  # the mesh refusal itself
        assert flash_enabled(1024)  # scope restores


@pytest.mark.parametrize("N,C,tiles", [
    (512, 64, {}),                                # default tile picker
    (256, 128, {"block_q": 64, "block_k": 64}),   # many tiles both ways
    (384, 32, {"block_q": 128, "block_k": 128}),  # non-power-of-two N
])
def test_flash_online_interpret_matches_xla_f32(N, C, tiles):
    """The streaming online-softmax variant (k/v tiled, running
    max/sum/acc rescaling in scratch) vs the dense path."""
    rng = np.random.RandomState(20)
    q, k, v = _qkv(rng, 2, N, C)
    got = fa.flash_attention_online(q, k, v, interpret=True, **tiles)
    want = _attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_online_interpret_matches_xla_bf16():
    rng = np.random.RandomState(21)
    q, k, v = _qkv(rng, 2, 512, 128, jnp.bfloat16)
    got = fa.flash_attention_online(q, k, v, interpret=True,
                                    block_q=128, block_k=128)
    want = _attention_xla(q, k, v)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_flash_online_grads_match_xla():
    """The online variant shares the primary's VJP rules (whole-k/v
    backward kernel when it fits, dense fallback otherwise)."""
    rng = np.random.RandomState(22)
    q, k, v = _qkv(rng, 2, 256, 64)
    got = _grad_scalar(
        lambda q_, k_, v_: fa.flash_attention_online(
            q_, k_, v_, interpret=True, block_q=64, block_k=64
        ), q, k, v,
    )
    want = _grad_scalar(_attention_xla, q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-4, rtol=5e-4,
            err_msg=f"d{name} mismatch",
        )


def test_flash_routes_online_beyond_plan_limit(monkeypatch):
    """flash_attention hands shapes the whole-k/v plan cannot hold to
    the streaming variant instead of raising."""
    rng = np.random.RandomState(23)
    # a shape no other test routes through flash_attention: its jit
    # cache is keyed on shapes, and a cached executable would skip the
    # traced-time envelope check this test monkeypatches
    q, k, v = _qkv(rng, 3, 128, 32)
    calls = {"online": 0}
    real = fa.flash_attention_online

    def counting(*a, **kw):
        calls["online"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(fa, "flash_attention_online", counting)
    monkeypatch.setattr(fa, "_FWD_PLAN_LIMIT", 1)  # primary can't plan
    got = flash_attention(q, k, v, interpret=True)
    want = _attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
    assert calls["online"] == 1


def _run_on_tpu(code: str) -> str:
    """conftest pins the suite to the CPU backend; hardware smokes run
    the snippet in a subprocess with the axon TPU platform restored
    (same pattern as test_qconv's TPU tests)."""
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=1800,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    return out.stdout


_TPU_PRELUDE = """
import jax, jax.numpy as jnp, jax.random as jr, numpy as np
from infodiffusion_tpu.cache import enable_compilation_cache
enable_compilation_cache()
assert jax.default_backend() == "tpu"
from infodiffusion_tpu.ops.attention import _attention_xla
from infodiffusion_tpu.ops.pallas.flash_attention import flash_attention
"""


@pytest.mark.skipif(
    os.environ.get("INFODIFF_TPU_TESTS") != "1",
    reason="opt-in TPU hardware smoke (INFODIFF_TPU_TESTS=1)",
)
def test_flash_tpu_hardware_grads():
    """Compiled backward kernel on real hardware vs the dense grad
    (the round-4 VERDICT defect's done-criterion)."""
    out = _run_on_tpu(
        _TPU_PRELUDE
        + """
q = jr.normal(jr.PRNGKey(0), (2, 1024, 128), jnp.bfloat16)
k = jr.normal(jr.PRNGKey(1), (2, 1024, 128), jnp.bfloat16)
v = jr.normal(jr.PRNGKey(2), (2, 1024, 128), jnp.bfloat16)
def loss_of(fn):
    def loss(q_, k_, v_):
        o = fn(q_, k_, v_)
        w = jnp.arange(o.size, dtype=jnp.float32).reshape(o.shape)
        return jnp.sum(o.astype(jnp.float32) * jnp.sin(w))
    return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
got = loss_of(flash_attention)(q, k, v)
want = loss_of(_attention_xla)(q, k, v)
for g, w, name in zip(got, want, "qkv"):
    g = np.asarray(g, np.float32); w = np.asarray(w, np.float32)
    np.testing.assert_allclose(g, w, atol=0.15, rtol=0.1,
                               err_msg="d" + name)
print("FLASH_GRADS_TPU_OK")
"""
    )
    assert "FLASH_GRADS_TPU_OK" in out


@pytest.mark.skipif(
    os.environ.get("INFODIFF_TPU_TESTS") != "1",
    reason="opt-in TPU hardware smoke (INFODIFF_TPU_TESTS=1)",
)
def test_flash_online_tpu_hardware_parity():
    """Compiled online-softmax variant at the 512px shape (N=16384 —
    above the whole-k/v envelope, so flash_attention auto-routes):
    the riskiest mechanism is Mosaic's handling of the 3-D grid with
    persistent VMEM scratch accumulators; the dense oracle is computed
    blockwise on the first 512 query rows (the full [N, N] square does
    not fit)."""
    out = _run_on_tpu(
        _TPU_PRELUDE
        + """
q = jr.normal(jr.PRNGKey(0), (1, 16384, 128), jnp.bfloat16)
k = jr.normal(jr.PRNGKey(1), (1, 16384, 128), jnp.bfloat16)
v = jr.normal(jr.PRNGKey(2), (1, 16384, 128), jnp.bfloat16)
out = flash_attention(q, k, v)  # whole-k/v plan refuses -> online
def dense_block(q, k, v):
    logits = jnp.einsum('bnc,bmc->bnm', q[:, :512], k,
                        preferred_element_type=jnp.float32) * (128 ** -0.5)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum('bnm,bmc->bnc', w.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)
want = np.asarray(jax.jit(dense_block)(q, k, v), np.float32)
got = np.asarray(out[:, :512], np.float32)
np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)
print('FLASH_ONLINE_TPU_OK maxdiff', float(np.abs(got - want).max()))
"""
    )
    assert "FLASH_ONLINE_TPU_OK" in out


@pytest.mark.skipif(
    os.environ.get("INFODIFF_TPU_TESTS") != "1",
    reason="opt-in TPU hardware smoke (INFODIFF_TPU_TESTS=1)",
)
def test_flash_tpu_hardware_parity():
    out = _run_on_tpu(
        _TPU_PRELUDE
        + """
q = jr.normal(jr.PRNGKey(4), (2, 4096, 128), jnp.bfloat16)
k = jr.normal(jr.PRNGKey(5), (2, 4096, 128), jnp.bfloat16)
v = jr.normal(jr.PRNGKey(6), (2, 4096, 128), jnp.bfloat16)
got = np.asarray(flash_attention(q, k, v), np.float32)
want = np.asarray(_attention_xla(q, k, v), np.float32)
np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)
print("FLASH_FWD_TPU_OK")
"""
    )
    assert "FLASH_FWD_TPU_OK" in out
