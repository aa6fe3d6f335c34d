"""Pallas kernel parity tests in interpret mode vs the pure-XLA
reference implementations (SURVEY.md §4.5)."""

import numpy as np
import jax.numpy as jnp
import pytest

from infodiffusion_tpu.ops.attention import _attention_xla
from infodiffusion_tpu.ops.norm import adagn as adagn_xla_dispatch
from infodiffusion_tpu.ops.norm import group_norm


def test_adagn_pallas_interpret_matches_xla():
    from infodiffusion_tpu.ops.pallas.adagn import adagn_pallas

    rng = np.random.RandomState(0)
    B, H, W, C, G = 2, 4, 4, 128, 32
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    gamma = jnp.asarray(rng.randn(C), jnp.float32)
    beta = jnp.asarray(rng.randn(C), jnp.float32)
    films = [
        (jnp.asarray(rng.randn(B, C), jnp.float32),
         jnp.asarray(rng.randn(B, C), jnp.float32))
        for _ in range(2)
    ]
    got = adagn_pallas(x, G, gamma, beta, films, interpret=True)

    want = group_norm(x, G, gamma, beta)
    for s, b in films:
        want = want * (1 + s[:, None, None, :]) + b[:, None, None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_adagn_pallas_no_film():
    from infodiffusion_tpu.ops.pallas.adagn import adagn_pallas

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 128), jnp.float32)
    gamma = jnp.ones((128,), jnp.float32)
    beta = jnp.zeros((128,), jnp.float32)
    got = adagn_pallas(x, 32, gamma, beta, [], interpret=True)
    want = group_norm(x, 32, gamma, beta)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_attention_pallas_interpret_matches_xla():
    import functools

    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from infodiffusion_tpu.ops.pallas import attention as att

    rng = np.random.RandomState(2)
    B, N, C = 2, 64, 128
    q = jnp.asarray(rng.randn(B, N, C), jnp.float32)
    k = jnp.asarray(rng.randn(B, N, C), jnp.float32)
    v = jnp.asarray(rng.randn(B, N, C), jnp.float32)

    spec = pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    got = pl.pallas_call(
        functools.partial(att._kernel, scale=float(C) ** -0.5),
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, N, C), v.dtype),
        interpret=True,
    )(q, k, v)
    want = _attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def _latent_model_and_params(d):
    import jax
    import jax.random as jr

    from infodiffusion_tpu.models import Diff

    model = Diff(T=100, shape=(1, d, d), is_latent=True)
    x = jnp.zeros((4, d))
    rngs = {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
            "dropout": jr.PRNGKey(2)}
    v = jax.jit(
        lambda: model.init(rngs, x, jnp.zeros((4,), jnp.int32))
    )()
    return model, v


@pytest.mark.parametrize("d", [32, 64])
def test_latent_mlp_fused_interpret_matches_model(d):
    import jax.random as jr

    from infodiffusion_tpu.ops.pallas.latent_mlp import (
        latent_eps_fn,
        pack_latent_unet_params,
    )

    model, v = _latent_model_and_params(d)
    packed_bf16 = pack_latent_unet_params(
        v["params"]["backbone"], d, dtype=jnp.bfloat16
    )
    eps = latent_eps_fn(packed_bf16, interpret=True)

    x = jr.normal(jr.PRNGKey(3), (8, d))
    t = jnp.asarray([0, 1, 7, 13, 50, 99, 3, 42], jnp.int32)
    got = eps(x, t)
    want = model.apply(v, x, t)
    # bf16 matmul weights inside the kernel vs f32 XLA: loose tolerance
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want, np.float32), atol=5e-2
    )
    # and tight agreement with the (default) f32 packing — isolates the
    # algebra, and checks the safe-by-default dtype policy
    packed_f32 = pack_latent_unet_params(v["params"]["backbone"], d)
    assert packed_f32["W"].dtype == jnp.float32
    got32 = latent_eps_fn(packed_f32, interpret=True)(x, t)
    np.testing.assert_allclose(
        np.asarray(got32), np.asarray(want, np.float32), atol=2e-5
    )
    # batch tiling: a partial trailing block (block_b=5 over 8 rows)
    # must agree with the single-block result
    from infodiffusion_tpu.ops.pallas.latent_mlp import (
        latent_unet_forward_pallas,
    )

    s = jnp.zeros((8, d))
    full = latent_unet_forward_pallas(packed_f32, x, s, interpret=True)
    tiled = latent_unet_forward_pallas(
        packed_f32, x, s, interpret=True, block_b=5
    )
    np.testing.assert_allclose(
        np.asarray(tiled), np.asarray(full), atol=1e-6
    )


def test_latent_mlp_fused_gate():
    from infodiffusion_tpu.ops.pallas.latent_mlp import (
        fused_latent_supported,
        use_fused_latent,
    )

    _, v = _latent_model_and_params(32)
    bb = v["params"]["backbone"]
    assert fused_latent_supported(bb, 32)
    assert not fused_latent_supported(bb, 64)
    assert not fused_latent_supported({}, 32)
    # ablated architectures the kernel hard-codes against must be
    # rejected: layer 0-8 without norm, or a conditioned layer 9
    no_norm = dict(bb)
    no_norm["layer_3"] = {
        k: val for k, val in bb["layer_3"].items() if k != "norm"
    }
    assert not fused_latent_supported(no_norm, 32)
    cond_tail = dict(bb)
    cond_tail["layer_9"] = dict(bb["layer_9"],
                                norm=bb["layer_3"]["norm"],
                                linear_emb=bb["layer_3"]["linear_emb"])
    assert not fused_latent_supported(cond_tail, 32)
    # CPU test backend -> fused path must stay off in the sampler
    # wrapper, with or without its env var
    import os

    assert not use_fused_latent()
    os.environ["INFODIFF_ENABLE_FUSED_LATENT"] = "1"
    try:
        assert not use_fused_latent()  # still off: backend is cpu
    finally:
        del os.environ["INFODIFF_ENABLE_FUSED_LATENT"]


def test_fused_shortcut_interpret_matches_xla():
    from infodiffusion_tpu.ops.pallas.shortcut_fused import (
        fused_shortcut_add,
        fused_shortcut_supported,
    )

    rng = np.random.RandomState(3)
    B, H, W = 2, 16, 16  # M = 512 rows -> tiles at 256/512
    cs, N = (128, 64), 64
    h = jnp.asarray(rng.randn(B, H, W, N), jnp.float32)
    pieces = [jnp.asarray(rng.randn(B, H, W, c), jnp.float32) for c in cs]
    kernel = jnp.asarray(rng.randn(sum(cs), N) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.randn(N), jnp.float32)
    assert fused_shortcut_supported(h, pieces)
    got = fused_shortcut_add(h, pieces, kernel, bias, interpret=True)
    want = h + (
        jnp.concatenate(pieces, -1).reshape(-1, sum(cs)) @ kernel + bias
    ).reshape(h.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fused_shortcut_single_piece_bf16():
    from infodiffusion_tpu.ops.pallas.shortcut_fused import (
        fused_shortcut_add,
    )

    rng = np.random.RandomState(4)
    h = jnp.asarray(rng.randn(4, 8, 8, 32), jnp.bfloat16)
    x = jnp.asarray(rng.randn(4, 8, 8, 16), jnp.bfloat16)
    kernel = jnp.asarray(rng.randn(16, 32) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(32), jnp.float32)
    got = fused_shortcut_add(h, [x], kernel, bias, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = h.astype(jnp.float32) + (
        x.reshape(-1, 16).astype(jnp.float32)
        @ kernel.astype(jnp.bfloat16).astype(jnp.float32)
        + bias
    ).reshape(h.shape)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=0.15, rtol=0.05
    )


def test_fused_shortcut_supported_limits():
    from infodiffusion_tpu.ops.pallas.shortcut_fused import (
        fused_shortcut_supported,
    )

    h = jnp.zeros((2, 16, 16, 64))
    # odd channel count -> unsupported
    assert not fused_shortcut_supported(h, [jnp.zeros((2, 16, 16, 63))])
    # rows not tileable (M = 2*3*3 = 18 has no 256+ power-of-2 divisor)
    assert not fused_shortcut_supported(
        jnp.zeros((2, 3, 3, 64)), [jnp.zeros((2, 3, 3, 64))]
    )
