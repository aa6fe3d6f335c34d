"""Shape and loss tests for every backbone and model family
(SURVEY.md §4.2-4.3), on tiny configs for CPU speed."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from infodiffusion_tpu.models import (
    AuxiliaryUNet,
    BottleneckAuxUNet,
    Decoder,
    Diff,
    Encoder,
    InfoDiff,
    LatentUNet,
    UNet,
    VAE,
    FeatureClassifier,
    pick_ch_mult,
)

RNGS = {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
        "reparam": jr.PRNGKey(2), "dropout": jr.PRNGKey(3)}
APPLY_RNGS = {"noise": jr.PRNGKey(1), "reparam": jr.PRNGKey(2),
              "dropout": jr.PRNGKey(3)}


def test_pick_ch_mult_table():
    # reference: models.py:619-622, 743-746, 785-788
    assert pick_ch_mult("diff", 28) == (1, 2, 4)
    assert pick_ch_mult("diff", 64) == (1, 2, 2, 2)
    assert pick_ch_mult("vanilla", 32) == (1, 2, 4, 8)
    assert pick_ch_mult("vae", 64) == (1, 2, 4, 8)


@pytest.mark.parametrize("cls", [UNet, AuxiliaryUNet, BottleneckAuxUNet])
def test_backbone_shapes(cls):
    B, H, C = 2, 16, 1
    x = jnp.zeros((B, H, H, C))
    t = jnp.zeros((B,), jnp.int32)
    kw = dict(T=10, ch=32, ch_mult=(1, 2), attn=(1,), out_ch=C)
    if cls is UNet:
        m = cls(**kw)
        v = m.init(RNGS, x, t)
        y = m.apply(v, x, t)
    else:
        m = cls(a_dim=4, **kw)
        a = jnp.zeros((B, 4))
        v = m.init(RNGS, x, t, a)
        y = m.apply(v, x, t, a)
    assert y.shape == x.shape


def test_encoder_decoder_shapes():
    B, H, C, adim = 2, 16, 1, 4
    x = jnp.zeros((B, H, H, C))
    enc = Encoder(a_dim=adim, shape=(C, H, H), ch=32, ch_mult=(1, 2), attn=(1,))
    v = enc.init(RNGS, x)
    a, a_q, mu, log_var = enc.apply(v, x, rngs=APPLY_RNGS)
    for z in (a, a_q, mu, log_var):
        assert z.shape == (B, adim)
    # a_q is a reparametrized draw around mu (reference: models.py:515)
    assert not np.allclose(np.asarray(a_q), np.asarray(mu))
    # sample=False returns mu deterministically
    _, a_q2, _, _ = enc.apply(v, x, sample=False)
    np.testing.assert_allclose(np.asarray(a_q2), np.asarray(mu))

    dec = Decoder(a_dim=adim, shape=(C, H, H), ch=32, ch_mult=(1, 2), attn=(1,))
    vd = dec.init(RNGS, a)
    rec = dec.apply(vd, a)
    assert rec.shape == (B, H, H, C)


def test_latent_unet_shapes():
    B, d = 4, 8
    x = jnp.zeros((B, d))
    t = jnp.zeros((B,), jnp.int32)
    m = LatentUNet(T=10, shape=(1, d, d))
    v = m.init(RNGS, x, t)
    y = m.apply(v, x, t)
    assert y.shape == (B, d)
    # 10 layers with input skip: layer_1..layer_9 see 4d+d inputs
    p = v["params"]
    assert p["layer_0"]["linear"]["kernel"].shape == (d, 4 * d)
    assert p["layer_1"]["linear"]["kernel"].shape == (5 * d, 4 * d)
    assert p["layer_9"]["linear"]["kernel"].shape == (5 * d, d)
    assert "norm" not in p["layer_9"]
    assert "linear_emb" not in p["layer_9"]


def _tiny_infodiff(**kw):
    base = dict(T=10, a_dim=4, shape=(1, 16, 16), unets_channels=32,
                encoder_channels=32, epochs=5)
    base.update(kw)
    return InfoDiff(**base)


def test_infodiff_loss_terms_mmd_only():
    m = _tiny_infodiff(mmd_weight=0.1, kld_weight=0.0)
    x = jnp.zeros((2, 16, 16, 1))
    v = m.init(RNGS, x, 0, method=InfoDiff.loss_fn)
    loss, aux = m.apply(v, x, 0, method=InfoDiff.loss_fn, rngs=APPLY_RNGS)
    assert jnp.isfinite(loss)
    assert set(aux) == {"denoise", "recon", "mmd"}


def test_infodiff_loss_terms_kld_and_capacity():
    m = _tiny_infodiff(mmd_weight=0.0, kld_weight=0.01, use_C=True, C_max=5.0)
    x = jnp.zeros((2, 16, 16, 1))
    v = m.init(RNGS, x, 0, method=InfoDiff.loss_fn)
    loss, aux = m.apply(v, x, 3, method=InfoDiff.loss_fn, rngs=APPLY_RNGS)
    assert jnp.isfinite(loss)
    assert set(aux) == {"denoise", "recon", "kld"}


def test_infodiff_loss_both_regularizers():
    m = _tiny_infodiff(mmd_weight=0.1, kld_weight=0.01)
    x = jnp.zeros((2, 16, 16, 1))
    v = m.init(RNGS, x, 0, method=InfoDiff.loss_fn)
    loss, aux = m.apply(v, x, 0, method=InfoDiff.loss_fn, rngs=APPLY_RNGS)
    assert set(aux) == {"denoise", "recon", "mmd", "kld"}


def test_infodiff_latent_routing():
    # mmd-only -> deterministic a; kld-only -> reparametrized a_q
    # (reference: models.py:714-721)
    m_mmd = _tiny_infodiff(mmd_weight=0.1, kld_weight=0.0)
    m_kld = _tiny_infodiff(mmd_weight=0.0, kld_weight=0.01)
    assert m_mmd._route_latent("a", "a_q") == "a"
    assert m_kld._route_latent("a", "a_q") == "a_q"
    m_both = _tiny_infodiff(mmd_weight=0.1, kld_weight=0.01)
    assert m_both._route_latent("a", "a_q") == "a_q"
    m_none = _tiny_infodiff(mmd_weight=0.0, kld_weight=0.0)
    assert m_none._route_latent("a", "a_q") == "a"


def test_diff_image_and_latent():
    x = jnp.zeros((2, 16, 16, 1))
    m = Diff(T=10, shape=(1, 16, 16), unets_channels=32)
    v = m.init(RNGS, x, 0, method=Diff.loss_fn)
    loss, _ = m.apply(v, x, 0, method=Diff.loss_fn, rngs=APPLY_RNGS)
    assert jnp.isfinite(loss)

    xl = jnp.zeros((4, 8))
    ml = Diff(T=10, shape=(1, 8, 8), is_latent=True)
    vl = ml.init(RNGS, xl, 0, method=Diff.loss_fn)
    lossl, _ = ml.apply(vl, xl, 0, method=Diff.loss_fn, rngs=APPLY_RNGS)
    assert jnp.isfinite(lossl)


@pytest.mark.parametrize(
    "mmd,kld", [(0.1, 0.0), (0.0, 0.01), (0.0, 0.0)],
    ids=["infovae", "betavae", "plain"],
)
def test_vae_families(mmd, kld):
    x = jnp.zeros((2, 16, 16, 1))
    m = VAE(a_dim=4, shape=(1, 16, 16), encoder_channels=32,
            mmd_weight=mmd, kld_weight=kld, epochs=5)
    v = m.init(RNGS, x, 0, method=VAE.loss_fn)
    loss, aux = m.apply(v, x, 0, method=VAE.loss_fn, rngs=APPLY_RNGS)
    assert jnp.isfinite(loss)
    rec, a_q, mu, log_var = m.apply(v, x, rngs=APPLY_RNGS)
    assert rec.shape == x.shape


def test_feature_classifier():
    m = FeatureClassifier(output_dim=40)
    x = jnp.zeros((2, 32))
    v = m.init(RNGS, x)
    y = m.apply(v, x, rngs=APPLY_RNGS)
    assert y.shape == (2, 40)
    assert ((np.asarray(y) >= 0) & (np.asarray(y) <= 1)).all()


def test_bf16_policy_params_stay_f32():
    """--bf16 activation policy: params are f32, loss finite
    (schedule/norm statistics are f32 by construction)."""
    m = Diff(T=8, shape=(1, 8, 8), is_latent=True, dtype=jnp.bfloat16)
    x = jnp.zeros((4, 8), jnp.float32)
    v = m.init(RNGS, x, 0, method=Diff.loss_fn)
    for leaf in jax.tree.leaves(v["params"]):
        assert leaf.dtype == jnp.float32
    loss, _ = m.apply(v, x, 0, method=Diff.loss_fn, rngs=APPLY_RNGS)
    assert jnp.isfinite(loss)
    out = m.apply(v, x, jnp.zeros((4,), jnp.int32))
    assert out.dtype == jnp.bfloat16


def test_infodiff_priors_10mix_and_roll():
    """Device-side prior draws in the loss (reference draws on host
    numpy; models.py:652-658). roll requires a_dim=2, 10mix even a_dim."""
    x = jnp.zeros((4, 16, 16, 1))
    for prior, a_dim in [("10mix", 4), ("roll", 2)]:
        m = _tiny_infodiff(a_dim=a_dim, prior=prior, mmd_weight=0.1)
        v = m.init(RNGS, x, 0, method=InfoDiff.loss_fn)
        loss, aux = m.apply(v, x, 0, method=InfoDiff.loss_fn,
                            rngs=APPLY_RNGS)
        assert jnp.isfinite(loss)
        assert "mmd" in aux


def test_vae_kld_capacity_branch():
    x = jnp.zeros((2, 16, 16, 1))
    m = VAE(a_dim=4, shape=(1, 16, 16), encoder_channels=32,
            mmd_weight=0.0, kld_weight=0.01, use_C=True, C_max=5.0,
            epochs=5)
    v = m.init(RNGS, x, 0, method=VAE.loss_fn)
    loss, aux = m.apply(v, x, 3, method=VAE.loss_fn, rngs=APPLY_RNGS)
    assert jnp.isfinite(loss) and "kld" in aux
