"""Sequence-parallel product wiring (--sp): parallel/sp.py routing of
ops.attention.single_head_attention through ring attention
(round-2 VERDICT #3).

Runs on the forced 8-device CPU mesh (conftest). The ring kernel itself
is equivalence-tested in test_ring_attention; here we guard the PRODUCT
path: the routing rules (threshold, divisibility, scoping), the
AttnBlock module, a full model forward, and gradients through the routed
op."""

import warnings

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from infodiffusion_tpu.ops.attention import _attention_xla, single_head_attention
from infodiffusion_tpu.parallel.ring_attention import make_seq_mesh
from infodiffusion_tpu.parallel.sp import configure_sp, sp_route, sp_scope


@pytest.fixture(autouse=True)
def _clean_sp_state():
    yield
    configure_sp(None)


def _qkv(B=2, N=64, C=16, seed=0):
    kq, kk, kv = jr.split(jr.PRNGKey(seed), 3)
    return (jr.normal(kq, (B, N, C)), jr.normal(kk, (B, N, C)),
            jr.normal(kv, (B, N, C)))


def test_sp_route_rules():
    mesh = make_seq_mesh(4)
    assert sp_route(64) is None  # not configured
    with sp_scope(mesh, min_tokens=64):
        assert sp_route(64) == (mesh, "seq")
        assert sp_route(32) is None  # below threshold
        with pytest.warns(UserWarning, match="do not divide"):
            assert sp_route(65) is None  # indivisible -> dense + warning
    assert sp_route(64) is None  # scope restored


def test_routed_attention_matches_dense():
    q, k, v = _qkv()
    want = _attention_xla(q, k, v)
    with sp_scope(make_seq_mesh(8), min_tokens=16):
        got = single_head_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=1e-5)


def test_routed_attention_at_128px_token_count():
    """N=1024 — the 32x32 attn-level grid of a 128px input, where the
    default threshold engages SP without any test-only override."""
    q, k, v = _qkv(B=1, N=1024, C=8, seed=1)
    want = _attention_xla(q, k, v)
    with sp_scope(make_seq_mesh(8)):  # default min_tokens=1024
        got = single_head_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=1e-5)


def test_attn_block_under_sp_matches_dense():
    from infodiffusion_tpu.nn.attention import AttnBlock

    blk = AttnBlock()
    x = jr.normal(jr.PRNGKey(2), (2, 8, 8, 32))
    v = blk.init({"params": jr.PRNGKey(0)}, x)
    want = blk.apply(v, x)
    with sp_scope(make_seq_mesh(8), min_tokens=16):
        got = blk.apply(v, x)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=1e-5)


def test_model_forward_under_sp_matches_dense():
    """Full InfoDiff eps-prediction with SP armed == dense — model-level
    SP, jitted (the samplers jit exactly this apply)."""
    from infodiffusion_tpu.models import InfoDiff

    model = InfoDiff(T=8, a_dim=8, shape=(1, 16, 16), unets_channels=32,
                     encoder_channels=32, mmd_weight=0.1, epochs=2)
    B = 2
    x = jr.normal(jr.PRNGKey(3), (B, 16, 16, 1))
    t = jnp.full((B,), 3)
    a = jr.normal(jr.PRNGKey(4), (B, 8))
    rngs = {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
            "reparam": jr.PRNGKey(2), "dropout": jr.PRNGKey(3)}
    v = model.init(rngs, x, t, a)
    want = jax.jit(lambda v, x, t, a: model.apply(v, x, t, a))(v, x, t, a)
    # 16px input, attn at level 2 -> 4x4 = 16 tokens
    with sp_scope(make_seq_mesh(8), min_tokens=16):
        got = jax.jit(lambda v, x, t, a: model.apply(v, x, t, a))(v, x, t, a)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=1e-5)


def test_gradients_through_routed_attention():
    q, k, v = _qkv(B=1, N=32, C=8, seed=5)

    def loss(fn):
        return lambda q: jnp.sum(jnp.square(fn(q, k, v)))

    g_dense = jax.grad(loss(_attention_xla))(q)
    with sp_scope(make_seq_mesh(8), min_tokens=8):
        g_sp = jax.grad(loss(single_head_attention))(q)
    np.testing.assert_allclose(np.asarray(g_dense), np.asarray(g_sp),
                               atol=1e-4, rtol=1e-4)


def test_runner_configure_sp(monkeypatch):
    from infodiffusion_tpu.config import Config
    from infodiffusion_tpu.runner import _configure_sp
    from infodiffusion_tpu.parallel import sp

    cfg = Config(model="diff", mode="eval", prior="regular", a_dim=8,
                 dataset="mnist", mmd_weight=0.1, sp=4)
    _configure_sp(cfg)
    assert sp._STATE["mesh"] is not None
    assert int(sp._STATE["mesh"].shape["seq"]) == 4
    _configure_sp(cfg.replace(sp=1))
    assert sp._STATE["mesh"] is None


def test_configure_sp_warns_when_threshold_unreachable():
    """Arming --sp on a config whose attention grids can never reach the
    token threshold silently costs data sharding — runner._configure_sp
    must say so (celeba 64px, attn level 2 -> 256 tokens < 1024)."""
    from infodiffusion_tpu.config import Config
    from infodiffusion_tpu.runner import _configure_sp
    from infodiffusion_tpu.parallel import sp

    cfg = Config(model="diff", mode="eval", prior="regular", a_dim=8,
                 dataset="celeba", mmd_weight=0.1, sp=4
                 ).with_dataset_config()
    try:
        with pytest.warns(UserWarning, match="will never engage"):
            _configure_sp(cfg)
    finally:
        configure_sp(None)


def test_configure_sp_warns_when_latency_bound():
    """--sp that ENGAGES but leaves too few tokens per device runs
    latency-bound (ring hops can't hide under chunk compute below the
    ~4.4k tokens/device speed-of-light bound — docs/PARALLELISM.md);
    the runner must say so. 128px at attn level 2 -> 1024 tokens >=
    the engage threshold, but 1024/4 = 256 tokens/device << 4096."""
    from infodiffusion_tpu.config import Config
    from infodiffusion_tpu.runner import _configure_sp

    cfg = Config(model="diff", mode="eval", prior="regular", a_dim=8,
                 dataset="celeba", mmd_weight=0.1, sp=4, input_size=128)
    try:
        with pytest.warns(UserWarning, match="latency-bound"):
            _configure_sp(cfg)
    finally:
        configure_sp(None)


def test_sp_grads_deep_attention_level():
    """Regression (round 3): with ring attention at the DEEPEST level of
    a UNet (middle blocks run at the attention resolution), GSPMD used
    to propagate the shard_map's token sharding into the surrounding
    fwd+bwd graph and mis-accumulate a cotangent — the tail conv's
    weight grad came out exactly 2x (silently wrong --sp training).
    ring_attention now pins its boundary to replicated shardings."""
    import jax.random as jr

    from infodiffusion_tpu.models.unet import UNet
    from infodiffusion_tpu.parallel.ring_attention import make_seq_mesh

    m = UNet(T=8, ch=32, ch_mult=(1, 2, 2), attn=(2,), num_res_blocks=1,
             out_ch=1)
    x = jr.normal(jr.PRNGKey(0), (2, 16, 16, 1))
    t = jnp.full((2,), 3)
    v = m.init({"params": jr.PRNGKey(1), "dropout": jr.PRNGKey(2)}, x, t)

    def loss(p):
        return jnp.mean(m.apply({"params": p}, x, t) ** 2)

    g_dense = jax.jit(jax.grad(loss))(v["params"])
    with sp_scope(make_seq_mesh(8), min_tokens=16):
        g_sp = jax.jit(jax.grad(loss))(v["params"])
    for (path, gd), gs in zip(
        jax.tree_util.tree_flatten_with_path(g_dense)[0],
        jax.tree.leaves(g_sp),
    ):
        nd = float(jnp.linalg.norm(gd))
        assert float(jnp.max(jnp.abs(gd - gs))) <= 1e-4 + 1e-3 * nd, (
            path, nd, float(jnp.linalg.norm(gs))
        )
