"""Pipeline-parallel (GPipe) executor tests — parallel/pp.py.

Runs on the forced multi-device CPU mesh (conftest). The executor is
demonstrated on the latent denoiser's homogeneous middle stack
(LatentUNet layers 1..8); three guarantees:

1. the functional middle layer matches the real MLPLNAct module,
2. gpipe == sequential execution of the same stages (forward),
3. gradients through the pipeline (ppermute/psum transpose) match the
   sequential path — the executor serves pipelined training.
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from infodiffusion_tpu.parallel.pp import (
    gpipe,
    latent_mid_stage_fn,
    latent_middle_sequential,
    make_stage_mesh,
    reshape_for_stages,
    stack_latent_middle,
)

D = 8
N_STAGES = 4


def _params():
    from infodiffusion_tpu.models import LatentUNet

    model = LatentUNet(T=16, shape=(1, D, D))
    v = model.init(
        {"params": jr.PRNGKey(0)}, jnp.zeros((2, D)),
        jnp.zeros((2,), jnp.int32),
    )
    return model, v["params"]


def _inputs(M=4, mb=4):
    k1, k2, k3 = jr.split(jr.PRNGKey(1), 3)
    h = jr.normal(k1, (M, mb, 4 * D))
    x = jr.normal(k2, (M, mb, D))
    cond = jr.normal(k3, (M, mb, D))
    return h, x, cond


def test_functional_mid_layer_matches_module():
    from infodiffusion_tpu.nn.blocks import MLPLNAct
    from infodiffusion_tpu.parallel.pp import _mid_layer

    _model, params = _params()
    h, x, cond = _inputs(M=1)
    h, x, cond = h[0], x[0], cond[0]
    for i in range(1, 9):
        blk = MLPLNAct(
            out_ch=4 * D, norm=True, use_cond=True, activation="silu",
            condition_bias=1.0, dropout=0.1,
        )
        want = blk.apply(
            {"params": params[f"layer_{i}"]},
            jnp.concatenate([h, x], axis=-1), cond, deterministic=True,
        )
        got = _mid_layer(params[f"layer_{i}"], h, x, cond, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5
        )
        h = got


@pytest.mark.skipif(
    len(jax.devices()) < N_STAGES, reason="needs a multi-device mesh"
)
def test_gpipe_matches_sequential_forward():
    _model, params = _params()
    stacked = stack_latent_middle(params)           # [8, ...]
    staged = reshape_for_stages(stacked, N_STAGES)  # [4, 2, ...]
    h, x, cond = _inputs()

    want = jax.vmap(
        lambda h_, x_, c_: latent_middle_sequential(stacked, h_, x_, c_)
    )(h, x, cond)

    mesh = make_stage_mesh(N_STAGES)
    got = gpipe(
        latent_mid_stage_fn(layers_per_stage=8 // N_STAGES),
        staged, h, (x, cond), mesh=mesh,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5
    )


@pytest.mark.skipif(
    len(jax.devices()) < N_STAGES, reason="needs a multi-device mesh"
)
def test_gpipe_gradients_match_sequential():
    _model, params = _params()
    stacked = stack_latent_middle(params)
    h, x, cond = _inputs()
    mesh = make_stage_mesh(N_STAGES)

    def loss_seq(stacked_):
        out = jax.vmap(
            lambda h_, x_, c_: latent_middle_sequential(stacked_, h_, x_, c_)
        )(h, x, cond)
        return jnp.sum(jnp.square(out))

    def loss_pp(stacked_):
        staged = reshape_for_stages(stacked_, N_STAGES)
        out = gpipe(
            latent_mid_stage_fn(layers_per_stage=8 // N_STAGES),
            staged, h, (x, cond), mesh=mesh,
        )
        return jnp.sum(jnp.square(out))

    v1, g1 = jax.value_and_grad(loss_seq)(stacked)
    v2, g2 = jax.value_and_grad(loss_pp)(stacked)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        ),
        g1, g2,
    )
