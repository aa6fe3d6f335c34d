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
    packed = pack_latent_unet_params(v["params"]["backbone"], d)
    eps = latent_eps_fn(packed, interpret=True)

    x = jr.normal(jr.PRNGKey(3), (8, d))
    t = jnp.asarray([0, 1, 7, 13, 50, 99, 3, 42], jnp.int32)
    got = eps(x, t)
    want = model.apply(v, x, t)
    # bf16 matmul weights inside the kernel vs f32 XLA: loose tolerance
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want, np.float32), atol=5e-2
    )
    # and tight agreement with f32 packing (isolates the algebra)
    packed_f32 = pack_latent_unet_params(
        v["params"]["backbone"], d, dtype=jnp.float32
    )
    got32 = latent_eps_fn(packed_f32, interpret=True)(x, t)
    np.testing.assert_allclose(
        np.asarray(got32), np.asarray(want, np.float32), atol=2e-5
    )


def test_latent_mlp_fused_gate():
    from infodiffusion_tpu.ops.pallas.latent_mlp import (
        fused_latent_supported,
        use_fused_latent,
    )

    _, v = _latent_model_and_params(32)
    assert fused_latent_supported(v["params"]["backbone"], 32)
    assert not fused_latent_supported(v["params"]["backbone"], 64)
    assert not fused_latent_supported({}, 32)
    # CPU test backend -> fused path must stay off in the sampler wrapper
    assert not use_fused_latent()
