"""Flash-style large-N attention kernel: interpret-mode parity vs the
XLA einsum path, q-tiling correctness, envelope fallbacks, and the
dispatch gate (ops/pallas/flash_attention.py; reference workload:
modules.py:145-164 AttnBlock at the 256px N=4096 grids)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from infodiffusion_tpu.ops.attention import _attention_xla
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
    # k/v too big for the whole-tensor VMEM plan (f32 N*C itemsize)
    q, k, v = _qkv(rng, 1, 32768, 64)
    with pytest.raises(NotImplementedError):
        flash_attention(q, k, v, interpret=True)
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


@pytest.mark.skipif(
    os.environ.get("INFODIFF_TPU_TESTS") != "1",
    reason="opt-in TPU hardware smoke (INFODIFF_TPU_TESTS=1)",
)
def test_flash_tpu_hardware_parity():
    rng = np.random.RandomState(4)
    q, k, v = _qkv(rng, 2, 4096, 128, jnp.bfloat16)
    got = flash_attention(q, k, v)
    want = _attention_xla(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )
