"""Unit tests for the hot ops vs numpy oracles (SURVEY.md §4.1)."""

import numpy as np
import pytest
import jax.numpy as jnp
import jax.random as jr

from infodiffusion_tpu.ops import (
    adagn,
    compute_kernel,
    compute_mmd,
    group_norm,
    single_head_attention,
)


def _np_group_norm(x, groups, scale, bias, eps=1e-5):
    B, H, W, C = x.shape
    xr = x.reshape(B, H * W, groups, C // groups).astype(np.float64)
    mean = xr.mean(axis=(1, 3), keepdims=True)
    var = xr.var(axis=(1, 3), keepdims=True)
    h = (xr - mean) / np.sqrt(var + eps)
    return h.reshape(x.shape) * scale + bias


def test_group_norm_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 4, 8).astype(np.float32)
    scale = rng.randn(8).astype(np.float32)
    bias = rng.randn(8).astype(np.float32)
    got = group_norm(jnp.asarray(x), 4, jnp.asarray(scale), jnp.asarray(bias))
    want = _np_group_norm(x, 4, scale, bias)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_adagn_dual_film():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 4, 8).astype(np.float32)
    scale = np.ones(8, np.float32)
    bias = np.zeros(8, np.float32)
    s_t, b_t = rng.randn(2, 8).astype(np.float32), rng.randn(2, 8).astype(np.float32)
    s_a, b_a = rng.randn(2, 8).astype(np.float32), rng.randn(2, 8).astype(np.float32)
    got = adagn(
        jnp.asarray(x), 4, jnp.asarray(scale), jnp.asarray(bias),
        [(jnp.asarray(s_t), jnp.asarray(b_t)), (jnp.asarray(s_a), jnp.asarray(b_a))],
    )
    h = _np_group_norm(x, 4, scale, bias)
    h = h * (1 + s_t[:, None, None, :]) + b_t[:, None, None, :]
    h = h * (1 + s_a[:, None, None, :]) + b_a[:, None, None, :]
    np.testing.assert_allclose(np.asarray(got), h, atol=1e-4)


def test_mmd_matches_reference_formula():
    """Oracle reproduces utils.py:74-90 incl. the /dim^2 bandwidth quirk."""
    rng = np.random.RandomState(2)
    x = rng.randn(6, 4).astype(np.float32)
    y = rng.randn(5, 4).astype(np.float32)

    def np_kernel(x, y):
        d = x.shape[1]
        tiled_x = x[:, None, :]
        tiled_y = y[None, :, :]
        return np.exp(-np.mean((tiled_x - tiled_y) ** 2, axis=2) / d)

    got_k = np.asarray(compute_kernel(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got_k, np_kernel(x, y), atol=1e-5)

    want = (
        np_kernel(x, x).mean() + np_kernel(y, y).mean() - 2 * np_kernel(x, y).mean()
    )
    got = float(compute_mmd(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_attention_matches_numpy():
    rng = np.random.RandomState(3)
    q = rng.randn(2, 16, 8).astype(np.float32)
    k = rng.randn(2, 16, 8).astype(np.float32)
    v = rng.randn(2, 16, 8).astype(np.float32)
    got = np.asarray(
        single_head_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    )
    logits = np.einsum("bnc,bmc->bnm", q, k) / np.sqrt(8)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    want = np.einsum("bnm,bmc->bnc", w, v)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_gn_stats_from_pieces_matches_concat():
    """Per-piece per-channel-sum GN stats (the producer-fusable form used
    for skip-concat norms) must match stats of the concatenated tensor —
    same math, different reduction order (f32 reassociation only)."""
    import jax.numpy as jnp
    import jax.random as jr

    from infodiffusion_tpu.ops.norm import (
        _gn_stats, _gn_stats_from_pieces, group_norm, group_norm_pieces,
    )

    k1, k2 = jr.split(jr.PRNGKey(0))
    a = jr.normal(k1, (4, 8, 8, 64), jnp.float32) * 1.7 + 0.3
    b = jr.normal(k2, (4, 8, 8, 128), jnp.float32) * 0.6 - 1.1
    cat = jnp.concatenate([a, b], axis=-1)
    m1, r1 = _gn_stats(cat, 32)
    m2, r2 = _gn_stats_from_pieces([a, b], 32)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-4)

    scale = jnp.linspace(0.5, 1.5, 192)
    bias = jnp.linspace(-0.1, 0.1, 192)
    # concat-free form: normalized pieces, re-concatenated == concat GN.
    # Piece widths (64, 128) deliberately MISalign with the 6-channel
    # groups of 192/32 to exercise the per-channel stat broadcast.
    got = jnp.concatenate(
        group_norm_pieces([a, b], 32, scale, bias), axis=-1
    )
    np.testing.assert_allclose(
        np.asarray(got),
        np.asarray(group_norm(cat, 32, scale, bias)),
        atol=2e-5,
    )


@pytest.mark.parametrize("env", ["INFODIFF_GN_SPLIT_STATS",
                                 "INFODIFF_GN_DOT_STATS"])
def test_gn_stats_layout_variants_match(env, monkeypatch):
    """The round-4 layout-experiment stat forms (half-W split reduce /
    dot-against-ones) are the SAME math as the default one-pass stats —
    f32 reassociation only. Exercised through group_norm AND the
    piece form (both take the env-gated path)."""
    import jax.numpy as jnp
    import jax.random as jr

    from infodiffusion_tpu.ops import norm as norm_mod

    k1, k2 = jr.split(jr.PRNGKey(7))
    a = jr.normal(k1, (2, 8, 16, 64), jnp.float32) * 1.3 - 0.2
    b = jr.normal(k2, (2, 8, 16, 64), jnp.float32) * 0.7 + 0.9
    cat = jnp.concatenate([a, b], axis=-1)
    scale = jnp.linspace(0.5, 1.5, 128)
    bias = jnp.linspace(-0.2, 0.2, 128)

    want = np.asarray(norm_mod.group_norm(cat, 32, scale, bias))
    want_p = np.asarray(jnp.concatenate(
        norm_mod.group_norm_pieces([a, b], 32, scale, bias), axis=-1
    ))
    monkeypatch.setenv(env, "1")
    got = np.asarray(norm_mod.group_norm(cat, 32, scale, bias))
    got_p = np.asarray(jnp.concatenate(
        norm_mod.group_norm_pieces([a, b], 32, scale, bias), axis=-1
    ))
    np.testing.assert_allclose(got, want, atol=2e-5)
    np.testing.assert_allclose(got_p, want_p, atol=2e-5)


def test_subpixel_upsample_matches_naive(monkeypatch):
    """The subpixel-decomposed UpSample (4 phase convs, 2x2 kernels) must
    equal the literal nearest-x2-then-conv3x3 with identical params —
    same math, kernel entries re-associated."""
    import jax.numpy as jnp
    import jax.random as jr

    from infodiffusion_tpu.nn.blocks import UpSample

    x = jr.normal(jr.PRNGKey(0), (2, 5, 7, 32))
    up = UpSample()
    v = up.init(jr.PRNGKey(1), x)
    naive = up.apply(v, x)
    monkeypatch.setenv("INFODIFF_SUBPIXEL_UPSAMPLE", "1")
    fast = up.apply(v, x)
    assert fast.shape == (2, 10, 14, 32)
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(naive), atol=2e-5
    )


def test_blocks_accept_piece_tuples():
    """A block fed (h, skip) pieces must equal the same block fed the
    pre-concatenated input (identical params, identical output)."""
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from infodiffusion_tpu.nn.blocks import ResBlock

    h = jr.normal(jr.PRNGKey(0), (2, 8, 8, 64))
    skip = jr.normal(jr.PRNGKey(1), (2, 8, 8, 128))
    temb = jr.normal(jr.PRNGKey(2), (2, 256))
    blk = ResBlock(out_ch=64)
    cat = jnp.concatenate([h, skip], axis=-1)
    v = blk.init({"params": jr.PRNGKey(3)}, cat, temb)
    out_cat = blk.apply(v, cat, temb)
    out_pieces = blk.apply(v, (h, skip), temb)
    np.testing.assert_allclose(
        np.asarray(out_pieces), np.asarray(out_cat), atol=2e-5
    )
