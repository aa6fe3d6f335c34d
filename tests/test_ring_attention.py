"""Sequence-parallel ring attention tests — parallel/ring_attention.py.

Runs on the forced multi-device CPU mesh (conftest): the token-sharded
log-sum-exp ring accumulation must match the plain single-head
attention op exactly (up to f32 reassociation), forward and gradients.
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from infodiffusion_tpu.ops.attention import _attention_xla
from infodiffusion_tpu.parallel.ring_attention import (
    make_seq_mesh, ring_attention,
)

S = 4

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < S, reason="needs a multi-device mesh"
)


def _qkv(B=2, N=64, C=32, dtype=jnp.float32):
    k1, k2, k3 = jr.split(jr.PRNGKey(0), 3)
    return (
        jr.normal(k1, (B, N, C), dtype),
        jr.normal(k2, (B, N, C), dtype),
        jr.normal(k3, (B, N, C), dtype),
    )


def test_ring_attention_matches_dense():
    q, k, v = _qkv()
    mesh = make_seq_mesh(S)
    got = ring_attention(q, k, v, mesh=mesh)
    want = _attention_xla(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5
    )


def test_ring_attention_bf16_policy():
    """bf16 activations, f32 softmax statistics — same convention as
    the dense op."""
    q, k, v = _qkv(dtype=jnp.bfloat16)
    mesh = make_seq_mesh(S)
    got = ring_attention(q, k, v, mesh=mesh)
    assert got.dtype == jnp.bfloat16
    want = _attention_xla(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2,
    )


def test_ring_attention_gradients_match_dense():
    q, k, v = _qkv()
    mesh = make_seq_mesh(S)

    def loss_ring(q_, k_, v_):
        return jnp.sum(jnp.square(ring_attention(q_, k_, v_, mesh=mesh)))

    def loss_dense(q_, k_, v_):
        return jnp.sum(jnp.square(_attention_xla(q_, k_, v_)))

    g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )
