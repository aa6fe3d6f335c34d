"""Training infrastructure tests: optimizer schedule, train step,
checkpoint round-trip, and DP-vs-single-device equivalence on the
virtual 8-device CPU mesh (SURVEY.md §4.3-4.4).

CPU-compile economy: the generic step/checkpoint/DP semantics are tested
on the latent Diff (MLP denoiser — compiles in seconds); conv-UNet
training is covered by a single shallow-ch_mult InfoDiff test (via
patched pick_ch_mult) that also exercises the sharded-MMD invariant, and
end-to-end by tests/test_cli_e2e.py.
"""

import math
from unittest import mock

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from infodiffusion_tpu.models import Diff, InfoDiff
from infodiffusion_tpu.parallel import make_mesh, replicate, shard_batch
from infodiffusion_tpu.train import (
    create_train_state,
    latest_checkpoint_epoch,
    make_optimizer,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
    warmup_cosine_schedule,
)


def test_lr_schedule_staircase():
    """Reference LR semantics (utils.py:133-160 + run.py:182-185):
    epoch 0 -> base, epoch 1 -> 2*base, epoch e>=2 -> cosine from 2*base."""
    base, epochs, spe = 1e-4, 10, 5
    sched = warmup_cosine_schedule(base, epochs, spe)
    assert np.isclose(float(sched(0)), base)
    assert np.isclose(float(sched(spe - 1)), base)
    assert np.isclose(float(sched(spe)), 2 * base)
    assert np.isclose(float(sched(2 * spe)), 2 * base)  # cos(0) epoch
    e = 5
    want = 2 * base * 0.5 * (1 + math.cos(math.pi * (e - 2) / epochs))
    assert np.isclose(float(sched(e * spe)), want, rtol=1e-5)


@pytest.fixture(scope="module")
def setup():
    """Shared latent-Diff model + optimizer + step fn (fast compiles)."""
    model = Diff(T=8, shape=(1, 16, 16), is_latent=True)
    x = jnp.asarray(np.random.RandomState(0).randn(16, 16), jnp.float32)
    tx = make_optimizer(1e-3, 3, 4)
    state = create_train_state(model, jr.PRNGKey(0), x, tx)
    step = make_train_step(model, tx, donate=False)
    return model, x, tx, state, step


def test_train_step_reduces_loss(setup):
    _model, x, _tx, state, step = setup
    losses = []
    for _ in range(30):
        state, m = step(state, x, 0)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 30
    assert np.isfinite(float(m["grad_norm"]))


def test_checkpoint_roundtrip(setup, tmp_path):
    _model, x, _tx, state, step = setup
    state, _ = step(state, x, 0)
    root = str(tmp_path / "ckpt")
    save_checkpoint(root, 1, state)
    assert latest_checkpoint_epoch(root) == 1

    restored = restore_checkpoint(root, 1, state)
    assert int(restored.step) == int(state.step)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        state.params, restored.params,
    )
    # resume continues identically (RNG folded from (root key, step))
    _s1, m1 = step(state, x, 0)
    _s2, m2 = step(restored, x, 0)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


def test_dp_matches_single_device(setup):
    """Global-batch semantics under the 8-device data mesh: one step on
    the sharded batch must equal the single-device step (the standard
    'distributed without a cluster' check, SURVEY.md §4.4)."""
    _model, x, _tx, state, step = setup
    s_single, m_single = step(state, x, 0)

    mesh = make_mesh(8)
    xs = shard_batch(mesh, x)
    state_r = replicate(mesh, state)
    s_dp, m_dp = step(state_r, xs, 0)
    np.testing.assert_allclose(
        float(m_dp["loss"]), float(m_single["loss"]), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        s_single.params, s_dp.params,
    )


def test_infodiff_conv_train_step_with_mmd_on_mesh():
    """Conv-UNet InfoDiff step + the sharded-MMD invariant: the O(B^2)
    MMD term must be identical sharded vs unsharded (SURVEY.md §7 'MMD on
    sharded batches'). Uses a shallow (1,2) ch_mult to keep CPU compiles
    tractable — the algebra under test is depth-independent."""
    with mock.patch(
        "infodiffusion_tpu.models.wrappers.pick_ch_mult",
        return_value=(1, 2),
    ):
        model = InfoDiff(
            T=8, a_dim=4, shape=(1, 8, 8), unets_channels=32,
            encoder_channels=32, mmd_weight=0.1, kld_weight=0.01, epochs=3,
            attn=(1,),
        )
        x = jnp.asarray(
            np.random.RandomState(2).randn(8, 8, 8, 1), jnp.float32
        )
        tx = make_optimizer(1e-4, 3, 4)
        state = create_train_state(model, jr.PRNGKey(0), x, tx)
        step = make_train_step(model, tx, donate=False)
        _, m_single = step(state, x, 0)

        mesh = make_mesh(8)
        _, m_dp = step(replicate(mesh, state), shard_batch(mesh, x), 0)
    np.testing.assert_allclose(
        float(m_dp["mmd"]), float(m_single["mmd"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m_dp["loss"]), float(m_single["loss"]), rtol=1e-4
    )
    assert np.isfinite(float(m_single["kld"]))


def test_ema_params_track_and_checkpoint(tmp_path):
    """EMA params update as ema*d + p*(1-d) per step and round-trip
    through checkpoints (new capability; the reference has no EMA)."""
    model = Diff(T=8, shape=(1, 16, 16), is_latent=True)
    x = jnp.asarray(np.random.RandomState(0).randn(8, 16), jnp.float32)
    tx = make_optimizer(1e-2, 3, 4)
    state = create_train_state(model, jr.PRNGKey(0), x, tx, ema=True)
    step = make_train_step(model, tx, donate=False, ema_decay=0.5)
    p0 = jax.tree.map(np.asarray, state.params)
    s1, _ = step(state, x, 0)
    want = jax.tree.map(
        lambda e, p: 0.5 * e + 0.5 * np.asarray(p), p0, s1.params
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), b, rtol=1e-6),
        s1.ema_params, want,
    )
    # ema differs from live params, and checkpoints round-trip it
    root = str(tmp_path / "ema_ckpt")
    save_checkpoint(root, 1, s1)
    restored = restore_checkpoint(root, 1, s1)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b)),
        s1.ema_params, restored.ema_params,
    )
    from infodiffusion_tpu.train.checkpoint import restore_params

    ema_restored = restore_params(root, 1, s1.params, prefer_ema=True)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b)),
        s1.ema_params, ema_restored,
    )


def test_fsdp_sharded_step_matches_replicated(setup):
    """FSDP/ZeRO placement: params + Adam moments sharded over the data
    axis must produce the same step as the replicated layout, while
    large params are actually distributed (new scaling capability)."""
    from infodiffusion_tpu.parallel import shard_state_fsdp
    from jax.sharding import PartitionSpec as P

    _model, x, _tx, state, step = setup
    mesh = make_mesh(8)
    s_repl, m_repl = step(replicate(mesh, state), shard_batch(mesh, x), 0)

    state_f = shard_state_fsdp(mesh, state, min_size=128)
    # at least one large param is genuinely sharded
    specs = [
        leaf.sharding.spec
        for leaf in jax.tree.leaves(state_f.params)
        if leaf.size >= 128
    ]
    assert any(s != P() for s in specs)
    s_fsdp, m_fsdp = step(state_f, shard_batch(mesh, x), 0)
    np.testing.assert_allclose(
        float(m_fsdp["loss"]), float(m_repl["loss"]), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        s_repl.params, s_fsdp.params,
    )
    # the updated state keeps the FSDP layout (no silent re-replication)
    out_specs = [
        leaf.sharding.spec
        for leaf in jax.tree.leaves(s_fsdp.params)
        if leaf.size >= 128
    ]
    assert any(s != P() for s in out_specs)


def test_training_determinism_across_fresh_runs():
    """Same seed => identical loss sequence from a fresh state (explicit
    key plumbing replaces the reference's global seeding; PARITY D7)."""
    def run():
        model = Diff(T=8, shape=(1, 16, 16), is_latent=True)
        x = jnp.asarray(np.random.RandomState(7).randn(8, 16), jnp.float32)
        tx = make_optimizer(1e-3, 3, 4)
        state = create_train_state(model, jr.PRNGKey(42), x, tx)
        step = make_train_step(model, tx, donate=False)
        out = []
        for _ in range(5):
            state, m = step(state, x, 0)
            out.append(float(m["loss"]))
        return out

    a, b = run(), run()
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_build_model_bf16_policy():
    from infodiffusion_tpu.config import Config
    from infodiffusion_tpu.models import build_model

    cfg = Config(model="diff", dataset="mnist", bf16=True).with_dataset_config()
    m = build_model(cfg)
    assert m.dtype == jnp.bfloat16
    cfg = cfg.replace(bf16=False)
    assert build_model(cfg).dtype == jnp.float32


def test_restore_params_missing_checkpoint_message(tmp_path):
    """Eval modes load model-{--epochs}; a missing epoch should name the
    flag and the nearest usable epoch (found via real-TPU CLI run)."""
    import pytest

    from infodiffusion_tpu.train.checkpoint import restore_params

    root = str(tmp_path / "exp")
    with pytest.raises(FileNotFoundError, match="train first"):
        restore_params(root, 20, {})
    (tmp_path / "exp" / "model-3").mkdir(parents=True)
    with pytest.raises(FileNotFoundError, match=r"-e/--epochs 3"):
        restore_params(root, 20, {})


def test_tp_sharded_step_matches_replicated(setup):
    """Tensor-parallel placement ('model'-axis weight shards, GSPMD
    collectives): same step results as the replicated layout, with
    output-feature dims genuinely distributed (new capability; the
    reference has no TP of any kind — SURVEY.md 2.3)."""
    from infodiffusion_tpu.parallel import shard_state_tp
    from infodiffusion_tpu.parallel.mesh import MODEL_AXIS
    from jax.sharding import PartitionSpec as P

    _model, x, _tx, state, step = setup
    mesh = make_mesh(8, model_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    s_repl, m_repl = step(replicate(mesh, state), shard_batch(mesh, x), 0)

    state_t = shard_state_tp(mesh, state, min_size=128)
    specs = [
        leaf.sharding.spec
        for leaf in jax.tree.leaves(state_t.params)
        if leaf.size >= 128
    ]
    assert any(s != P() and MODEL_AXIS in [a for a in s if a] for s in specs)
    s_tp, m_tp = step(state_t, shard_batch(mesh, x), 0)
    np.testing.assert_allclose(
        float(m_tp["loss"]), float(m_repl["loss"]), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        s_repl.params, s_tp.params,
    )
    # layout survives the update
    out_specs = [
        leaf.sharding.spec
        for leaf in jax.tree.leaves(s_tp.params)
        if leaf.size >= 128
    ]
    assert any(MODEL_AXIS in [a for a in s if a] for s in out_specs)


def test_tp_plus_fsdp_2d_sharding(setup):
    """tp + fsdp composed: 'model' on output features AND 'data' on the
    largest remaining dim, still step-equivalent to replicated."""
    from infodiffusion_tpu.parallel import shard_state_tp

    _model, x, _tx, state, step = setup
    mesh = make_mesh(8, model_parallel=2)
    s_repl, m_repl = step(replicate(mesh, state), shard_batch(mesh, x), 0)
    state_2d = shard_state_tp(
        mesh, state, min_size=128, fsdp=True, fsdp_min_size=128
    )
    both = [
        set(a for a in leaf.sharding.spec if a)
        for leaf in jax.tree.leaves(state_2d.params)
    ]
    assert {"data", "model"} in both  # at least one fully-2D weight
    s_2d, m_2d = step(state_2d, shard_batch(mesh, x), 0)
    np.testing.assert_allclose(
        float(m_2d["loss"]), float(m_repl["loss"]), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        s_repl.params, s_2d.params,
    )


def test_make_mesh_rejects_nondividing_tp():
    import pytest

    with pytest.raises(ValueError, match="--tp"):
        make_mesh(8, model_parallel=3)


def test_async_checkpoint_roundtrip_and_retention(setup, tmp_path):
    from infodiffusion_tpu.train.checkpoint import (
        save_checkpoint as save, wait_for_saves,
    )

    _model, x, _tx, state, step = setup
    root = str(tmp_path / "ckpt_async")
    for epoch in (1, 2, 3):
        state, _ = step(state, x, 0)
        save(root, epoch, state, async_save=True, keep=2)
    wait_for_saves()
    # retention kept the newest two (2 was pruned when 3 landed, after
    # the in-flight write barrier on the next save)
    import os

    kept = sorted(d for d in os.listdir(root) if d.startswith("model-"))
    assert "model-3" in kept and "model-1" not in kept
    assert latest_checkpoint_epoch(root) == 3
    restored = restore_checkpoint(root, 3, state)
    assert int(restored.step) == int(state.step)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        state.params, restored.params,
    )


def test_async_retention_deferred_past_inflight_save(setup, tmp_path):
    """With keep=1 the previous epoch must survive until the new async
    save is FINALIZED — pruning it while the write is in flight would
    leave zero complete checkpoints if the process died mid-write
    (round-2 review). Retention flushes at the next save's barrier or at
    wait_for_saves()."""
    import os

    from infodiffusion_tpu.train.checkpoint import wait_for_saves

    _model, x, _tx, state, step = setup
    root = str(tmp_path / "ckpt_keep1")
    save_checkpoint(root, 1, state, async_save=True, keep=1)
    wait_for_saves()
    assert os.path.isdir(os.path.join(root, "model-1"))
    save_checkpoint(root, 2, state, async_save=True, keep=1)
    # save 2 may still be in flight here: model-1 must not be pruned yet
    assert os.path.isdir(os.path.join(root, "model-1"))
    wait_for_saves()
    kept = sorted(d for d in os.listdir(root) if d.startswith("model-"))
    assert kept == ["model-2"]


def test_restore_params_weights_only_without_ema(setup, tmp_path):
    """restore_params reads just the params subtree (metadata decides
    the params/EMA pick without fetching tensors); prefer_ema on a
    checkpoint saved without EMA falls back to live params."""
    _model, x, _tx, state, step = setup
    assert state.ema_params is None
    root = str(tmp_path / "ckpt_noema")
    save_checkpoint(root, 1, state)
    from infodiffusion_tpu.train.checkpoint import restore_params

    got = restore_params(root, 1, state.params, prefer_ema=True)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b)),
        state.params, got,
    )
    # structure mismatch still raises (guards the eval-time sanity check)
    with pytest.raises(Exception):
        restore_params(root, 1, {"bogus": jnp.zeros((2,))})


def test_eval_encode_step_pick_mu():
    """pick_mu applies the regularizer latent table INSIDE the jit
    (kld!=0 -> mu, else deterministic a; reference run.py:429-438), so
    only the chosen latent crosses the device boundary."""
    from infodiffusion_tpu.train.step import make_eval_encode_step

    m = InfoDiff(T=10, a_dim=4, shape=(1, 16, 16), unets_channels=32,
                 encoder_channels=32, epochs=5)
    x = jnp.zeros((2, 16, 16, 1)) + 0.1
    v = jax.jit(
        lambda: m.init(
            {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
             "dropout": jr.PRNGKey(2)},
            x, 0, method=InfoDiff.loss_fn,
        )
    )()
    a, _aq, mu, _lv = m.apply(
        {"params": v["params"]}, x, method=InfoDiff.encode, sample=False
    )
    got_a = make_eval_encode_step(m, pick_mu=False)(v["params"], x)
    got_mu = make_eval_encode_step(m, pick_mu=True)(v["params"], x)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(a), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_mu), np.asarray(mu), atol=1e-6)
