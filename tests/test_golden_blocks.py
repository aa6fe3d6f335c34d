"""Golden-value tests: full block forwards vs independent numpy
implementations of the documented equations, using params extracted from
the Flax modules (SURVEY.md §4.2)."""

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

from infodiffusion_tpu.nn import AuxResBlock, MLPLNAct, TimeEmbedding


def _np_gn(x, scale, bias, groups=32, eps=1e-5):
    B, H, W, C = x.shape
    xr = x.reshape(B, H * W, groups, C // groups).astype(np.float64)
    mean = xr.mean(axis=(1, 3), keepdims=True)
    var = xr.var(axis=(1, 3), keepdims=True)
    h = ((xr - mean) / np.sqrt(var + eps)).reshape(x.shape)
    return h * scale + bias


def _np_silu(x):
    return x / (1.0 + np.exp(-x))


def _np_conv3(x, kernel, bias):
    """3x3 same-padding conv, NHWC x HWIO."""
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = kernel.shape
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = np.zeros((B, H, W, Cout))
    for i in range(kh):
        for j in range(kw):
            out += np.einsum(
                "bhwc,cd->bhwd", xp[:, i : i + H, j : j + W, :], kernel[i, j]
            )
    return out + bias


def test_aux_resblock_matches_numpy_equations():
    """AuxResBlock = GN-SiLU-conv; GN*(1+s_t)+b_t then *(1+s_a)+b_a;
    SiLU-conv; GN-SiLU-conv; +shortcut (reference: modules.py:309-328;
    dropout off, no attention)."""
    B, H, W, C = 2, 4, 4, 32
    out_ch = 32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    temb = jnp.asarray(rng.randn(B, 16), jnp.float32)
    aemb = jnp.asarray(rng.randn(B, 16), jnp.float32)

    block = AuxResBlock(out_ch=out_ch, dropout=0.0, attn=False)
    v = block.init({"params": jr.PRNGKey(0)}, x, temb, aemb)
    got = np.asarray(block.apply(v, x, temb, aemb))

    p = jax.tree.map(np.asarray, v["params"])
    xn = np.asarray(x, np.float64)

    h = _np_gn(xn, p["norm1"]["scale"], p["norm1"]["bias"])
    h = _np_silu(h)
    h = _np_conv3(h, p["conv1"]["kernel"], p["conv1"]["bias"])

    t = _np_silu(np.asarray(temb, np.float64)) @ p["temb_proj"]["kernel"] + \
        p["temb_proj"]["bias"]
    a = _np_silu(np.asarray(aemb, np.float64)) @ p["aemb_proj"]["kernel"] + \
        p["aemb_proj"]["bias"]
    ts, tb = t[:, :out_ch], t[:, out_ch:]
    as_, ab = a[:, :out_ch], a[:, out_ch:]
    h = _np_gn(h, p["norm2"]["scale"], p["norm2"]["bias"])
    h = h * (1 + ts[:, None, None, :]) + tb[:, None, None, :]
    h = h * (1 + as_[:, None, None, :]) + ab[:, None, None, :]
    h = _np_silu(h)
    h = _np_conv3(h, p["conv2"]["kernel"], p["conv2"]["bias"])

    h = _np_gn(h, p["norm3"]["scale"], p["norm3"]["bias"])
    h = _np_silu(h)
    h = _np_conv3(h, p["conv3"]["kernel"], p["conv3"]["bias"])
    want = h + xn  # same channels -> identity shortcut

    np.testing.assert_allclose(got, want, atol=2e-4)


def test_mlplnact_matches_numpy_equations():
    """linear -> x*(1+cond) -> LayerNorm -> SiLU (reference:
    models.py:147-163 with condition_bias=1, activation silu)."""
    B, Din, Dout, Dc = 3, 8, 12, 8
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, Din), jnp.float32)
    cond = jnp.asarray(rng.randn(B, Dc), jnp.float32)
    m = MLPLNAct(out_ch=Dout, norm=True, use_cond=True, activation="silu",
                 condition_bias=1.0, dropout=0.0)
    v = m.init({"params": jr.PRNGKey(0)}, x, cond)
    got = np.asarray(m.apply(v, x, cond))

    p = jax.tree.map(np.asarray, v["params"])
    xn = np.asarray(x, np.float64)
    h = xn @ p["linear"]["kernel"] + p["linear"]["bias"]
    c = _np_silu(np.asarray(cond, np.float64)) @ p["linear_emb"]["kernel"] + \
        p["linear_emb"]["bias"]
    h = h * (1.0 + c)
    mu = h.mean(-1, keepdims=True)
    var = h.var(-1, keepdims=True)
    h = (h - mu) / np.sqrt(var + 1e-5)
    h = h * p["norm"]["scale"] + p["norm"]["bias"]
    want = _np_silu(h)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_time_embedding_table_layout():
    """Interleaved sin/cos pairs (reference: modules.py:13-20): column 0
    is sin(pos·f0), column 1 is cos(pos·f0), etc."""
    from infodiffusion_tpu.nn import sinusoidal_table

    T, d = 16, 8
    tab = np.asarray(sinusoidal_table(T, d))
    freqs = np.exp(-np.arange(0, d, 2) / d * np.log(10000.0))
    pos = np.arange(T)[:, None] * freqs[None, :]
    np.testing.assert_allclose(tab[:, 0::2], np.sin(pos), atol=1e-6)
    np.testing.assert_allclose(tab[:, 1::2], np.cos(pos), atol=1e-6)


def test_functional_timestep_embedding_layout():
    """Concatenated [cos | sin] halves, fractional t supported
    (reference: modules.py:41-60)."""
    from infodiffusion_tpu.nn import timestep_embedding

    t = jnp.asarray([0.5, 3.0])
    emb = np.asarray(timestep_embedding(t, 8))
    freqs = np.exp(-np.log(10000.0) * np.arange(4) / 4)
    args = np.asarray(t)[:, None] * freqs[None, :]
    np.testing.assert_allclose(emb[:, :4], np.cos(args), atol=1e-6)
    np.testing.assert_allclose(emb[:, 4:], np.sin(args), atol=1e-6)
