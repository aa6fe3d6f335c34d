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


# ---------------------------------------------------------------------------
# Product path: --pp pipelined latent-DDIM training (round-2 VERDICT #4)
# ---------------------------------------------------------------------------


def test_latent_pp_forward_matches_module():
    """Full pipelined LatentUNet forward (time embed + layer 0 + gpipe
    middle + final layer) == the flax module, deterministic."""
    from infodiffusion_tpu.parallel.pp import latent_pp_forward

    model, params = _params()
    B = 8
    k1, k2 = jr.split(jr.PRNGKey(3))
    x = jr.normal(k1, (B, D))
    t = jr.randint(k2, (B,), 0, 16)
    want = model.apply({"params": params}, x, t, deterministic=True)
    got = latent_pp_forward(
        params, x, t, mesh=make_stage_mesh(N_STAGES), microbatches=4,
    )
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=1e-5)


def test_pp_latent_loss_matches_diff_loss():
    """pp_latent_loss == Diff.loss_fn(is_latent) on the same injected
    (t, eps), deterministic (reference loss: models.py:753-762)."""
    from infodiffusion_tpu.diffusion.schedule import make_schedule, q_sample
    from infodiffusion_tpu.models import Diff
    from infodiffusion_tpu.parallel.pp import pp_latent_loss

    model = Diff(T=16, shape=(1, D, D), is_latent=True)
    v = model.init(
        {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1)},
        jnp.zeros((2, D)), jnp.zeros((2,), jnp.int32),
    )
    B = 8
    k1, k2, k3 = jr.split(jr.PRNGKey(4), 3)
    x = jr.normal(k1, (B, D))
    t = jr.randint(k2, (B,), 0, 16)
    eps = jr.normal(k3, (B, D))
    want, _ = model.apply(
        {"params": v["params"]}, x, 0, method=Diff.loss_fn,
        deterministic=True, t=t, eps=eps,
    )
    sched = make_schedule(1e-5, 1e-2, 16)
    got = pp_latent_loss(
        v["params"], q_sample(sched, x, t, eps), t, eps,
        mesh=make_stage_mesh(N_STAGES), microbatches=4,
    )
    np.testing.assert_allclose(float(want), float(got), atol=1e-6, rtol=1e-6)


def test_pp_grads_match_sequential_loss():
    """Gradients of the pipelined loss == gradients of Diff.loss_fn on
    the same (t, eps) — pipelined TRAINING is numerically the plain
    step."""
    from infodiffusion_tpu.diffusion.schedule import make_schedule, q_sample
    from infodiffusion_tpu.models import Diff
    from infodiffusion_tpu.parallel.pp import pp_latent_loss

    model = Diff(T=16, shape=(1, D, D), is_latent=True)
    v = model.init(
        {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1)},
        jnp.zeros((2, D)), jnp.zeros((2,), jnp.int32),
    )
    B = 8
    k1, k2, k3 = jr.split(jr.PRNGKey(5), 3)
    x = jr.normal(k1, (B, D))
    t = jr.randint(k2, (B,), 0, 16)
    eps = jr.normal(k3, (B, D))
    sched = make_schedule(1e-5, 1e-2, 16)
    x_tilde = q_sample(sched, x, t, eps)

    g_seq = jax.grad(
        lambda p: model.apply(
            {"params": p}, x, 0, method=Diff.loss_fn,
            deterministic=True, t=t, eps=eps,
        )[0]
    )(v["params"])
    g_pp = jax.grad(
        lambda p: pp_latent_loss(
            p, x_tilde, t, eps, mesh=make_stage_mesh(N_STAGES),
            microbatches=4,
        )
    )(v["params"])
    flat_seq = jax.tree.leaves(g_seq)
    flat_pp = jax.tree.leaves(g_pp)
    assert len(flat_seq) == len(flat_pp)
    for a, b in zip(flat_seq, flat_pp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
        )


def test_make_pp_train_step_runs_and_matches():
    """One --pp train step: (a) the dropout-off step's loss equals the
    sequential no-dropout loss on the step's own derived (t, eps);
    (b) the real (dropout-on) step runs finite."""
    from infodiffusion_tpu.diffusion.schedule import make_schedule, q_sample
    from infodiffusion_tpu.models import Diff
    from infodiffusion_tpu.parallel.pp import make_pp_train_step
    from infodiffusion_tpu.train import create_train_state, make_optimizer

    model = Diff(T=16, shape=(1, D, D), is_latent=True)
    B = 8
    x = jr.normal(jr.PRNGKey(6), (B, D))
    tx = make_optimizer(1e-4, 2, 4)
    state = create_train_state(model, jr.PRNGKey(0), x, tx)
    mesh = make_stage_mesh(N_STAGES)
    # the step donates its input state — keep host copies for the oracle
    rng0 = jax.tree.map(np.asarray, state.rng)
    params0 = jax.tree.map(np.asarray, state.params)
    step0 = int(state.step)

    step_det = make_pp_train_step(
        model, tx, mesh, microbatches=4, deterministic_dropout_off=True
    )
    new_state, metrics = step_det(state, x, 0)
    assert int(new_state.step) == 1

    # reproduce the step's internal draws and check the loss scalar
    k = jr.fold_in(jnp.asarray(rng0), step0)
    k_noise, _k_drop = jr.split(k)
    k_t, k_eps = jr.split(k_noise)
    t = jr.randint(k_t, (B,), 0, 16)
    eps = jr.normal(k_eps, x.shape, x.dtype)
    want, _ = model.apply(
        {"params": jax.tree.map(jnp.asarray, params0)}, x, 0,
        method=Diff.loss_fn, deterministic=True, t=t, eps=eps,
    )
    np.testing.assert_allclose(float(want), float(metrics["loss"]),
                               atol=1e-6, rtol=1e-6)

    # the real step (functional dropout masks riding with microbatches)
    state2 = create_train_state(model, jr.PRNGKey(0), x, tx)
    step = make_pp_train_step(model, tx, mesh, microbatches=4)
    _, m2 = step(state2, x, 0)
    assert np.isfinite(float(m2["loss"]))
    # dropout perturbs, it does not transform: same order of magnitude
    assert abs(float(m2["loss"]) - float(metrics["loss"])) < 1.0


# ---------------------------------------------------------------------------
# dp x pp composition (round-3 VERDICT #8): data-parallel pipeline
# replicas over a ('data', 'stage') 2-D mesh
# ---------------------------------------------------------------------------


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices for the 2x4 mesh"
)
def test_gpipe_dp_composition_matches_sequential():
    """gpipe over a (data=2, stage=4) mesh == sequential: each data row
    runs its own ppermute ring on its microbatch slice."""
    from infodiffusion_tpu.parallel.pp import make_dp_stage_mesh

    _model, params = _params()
    stacked = stack_latent_middle(params)
    staged = reshape_for_stages(stacked, N_STAGES)
    h, x, cond = _inputs()  # mb=4 divides over the 2-wide data axis

    want = jax.vmap(
        lambda h_, x_, c_: latent_middle_sequential(stacked, h_, x_, c_)
    )(h, x, cond)
    got = gpipe(
        latent_mid_stage_fn(layers_per_stage=8 // N_STAGES),
        staged, h, (x, cond), mesh=make_dp_stage_mesh(2, N_STAGES),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_gpipe_dp_composition_gradients_match_sequential():
    """Gradients through the 2-D dp x pp mesh == sequential. The loss
    check alone cannot see a mis-scaled/dropped psum of stage-param
    cotangents over the added 'data' axis (the shard_map
    check_rep=False transpose footgun) — the 1-D suite pins forward AND
    gradients, so the composition must too."""
    from infodiffusion_tpu.parallel.pp import make_dp_stage_mesh

    _model, params = _params()
    stacked = stack_latent_middle(params)
    h, x, cond = _inputs()
    mesh = make_dp_stage_mesh(2, N_STAGES)

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


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices for the 2x4 mesh"
)
def test_pp_train_step_dp_composition_loss_matches():
    """make_pp_train_step on the dp x pp mesh reproduces the
    single-device sequential loss on the step's derived draws (the same
    equivalence the 1-D pp test pins, now with the batch sharded over
    'data')."""
    from infodiffusion_tpu.models import Diff
    from infodiffusion_tpu.parallel.pp import (
        make_dp_stage_mesh, make_pp_train_step,
    )
    from infodiffusion_tpu.train import create_train_state, make_optimizer

    model = Diff(T=16, shape=(1, D, D), is_latent=True)
    B = 8
    x = jr.normal(jr.PRNGKey(5), (B, D))
    tx = make_optimizer(1e-4, 2, 4)
    state = create_train_state(model, jr.PRNGKey(0), x, tx)
    rng0, step0, params0 = state.rng, int(state.step), state.params

    step = make_pp_train_step(
        model, tx, make_dp_stage_mesh(2, N_STAGES), microbatches=4,
        deterministic_dropout_off=True,
    )
    # the step donates its state arg; keep ours alive for the oracle
    _, metrics = step(jax.tree.map(jnp.copy, state), x, 0)

    k = jr.fold_in(jnp.asarray(rng0), step0)
    k_noise, _ = jr.split(k)
    k_t, k_eps = jr.split(k_noise)
    t = jr.randint(k_t, (B,), 0, 16)
    eps = jr.normal(k_eps, x.shape, x.dtype)
    want, _ = model.apply(
        {"params": jax.tree.map(jnp.asarray, params0)}, x, 0,
        method=Diff.loss_fn, deterministic=True, t=t, eps=eps,
    )
    np.testing.assert_allclose(float(want), float(metrics["loss"]),
                               atol=1e-6, rtol=1e-6)
