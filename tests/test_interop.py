"""Torch-checkpoint interop tests: round-trip export->load bijection and
reference key-name/layout fidelity (reference: run.py:157 state_dict
checkpoints; module tree in models.py/modules.py)."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from infodiffusion_tpu.interop import (
    export_torch_state_dict,
    load_torch_state_dict,
    param_key_map,
)
from infodiffusion_tpu.models import Diff, InfoDiff, VAE

RNGS = {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
        "reparam": jr.PRNGKey(2), "dropout": jr.PRNGKey(3)}


def _roundtrip(model, params):
    sd = export_torch_state_dict(model, params)
    zeros = jax.tree.map(jnp.zeros_like, params)
    restored = load_torch_state_dict(model, zeros, sd, strict=True)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, restored,
    )
    return sd


def test_infodiff_roundtrip_and_reference_keys():
    model = InfoDiff(T=8, a_dim=4, shape=(1, 16, 16), unets_channels=32,
                     encoder_channels=32, epochs=2)
    x = jnp.zeros((1, 16, 16, 1))
    v = model.init(RNGS, x, 0, method=InfoDiff.loss_fn)
    sd = _roundtrip(model, v["params"])

    # reference module-tree key spots (models.py:237-326, 424-518):
    # [1,2,2,2]: downblocks interleave DownSample at 2, 5, 8
    assert "backbone.head.weight" in sd
    assert sd["backbone.head.weight"].shape == (32, 1, 3, 3)  # OIHW
    assert "backbone.downblocks.0.block1.2.weight" in sd
    assert "backbone.downblocks.2.main.weight" in sd  # DownSample
    assert "backbone.downblocks.3.temb_proj.1.weight" in sd
    assert "backbone.downblocks.3.aemb_proj.1.weight" in sd
    assert "backbone.middleblocks.0.attn.proj_q.weight" in sd
    assert sd["backbone.middleblocks.0.attn.proj_q.weight"].ndim == 4  # 1x1
    assert "backbone.upblocks.3.main.weight" in sd  # UpSample after 3 blocks
    assert "backbone.upblocks.4.block1.0.weight" in sd
    assert "backbone.tail.2.weight" in sd
    assert "backbone.time_embedding.timembedding.1.weight" in sd
    assert "backbone.fc_a.weight" in sd
    assert "encoder.fc_mu.weight" in sd
    # attention sits at level 2 -> downblocks.6/7 carry attn
    assert "backbone.downblocks.6.attn.proj.weight" in sd
    # torch linear layout [out, in]
    assert sd["backbone.fc_a.weight"].shape == (128, 4)  # tdim=4*32


def test_bottleneck_fc_a_key():
    model = InfoDiff(T=8, a_dim=4, shape=(1, 16, 16), unets_channels=32,
                     encoder_channels=32, epochs=2, is_bottleneck=True)
    x = jnp.zeros((1, 16, 16, 1))
    v = model.init(RNGS, x, 0, method=InfoDiff.loss_fn)
    sd = _roundtrip(model, v["params"])
    # Sequential(SiLU, Linear) -> fc_a.1 (reference: models.py:336-339)
    assert "backbone.fc_a.1.weight" in sd
    assert "backbone.fc_a.weight" not in sd


def test_vanilla_unet_roundtrip():
    model = Diff(T=8, shape=(1, 16, 16), unets_channels=32,
                 ch_mult=(1, 2), attn=(1,))
    x = jnp.zeros((1, 16, 16, 1))
    v = model.init(RNGS, x, 0, method=Diff.loss_fn)
    sd = _roundtrip(model, v["params"])
    assert "backbone.downblocks.1.block2.3.weight" in sd
    assert "backbone.downblocks.1.block3.3.weight" in sd  # 3-conv ResBlock


def test_num_res_blocks_threads_into_key_map():
    """param_key_map must read num_res_blocks from the MODEL — a
    hardcoded nrb=2 would mis-index the flat ModuleList skeleton for
    any other depth. With nrb=1, levels=2: down path is [block,
    DownSample, block] (indices 0,1,2); up path is [block, block,
    UpSample, block, block] (0,1,2,3,4)."""
    model = Diff(T=8, shape=(1, 16, 16), unets_channels=32,
                 ch_mult=(1, 2), attn=(1,), num_res_blocks=1)
    x = jnp.zeros((1, 16, 16, 1))
    v = model.init(RNGS, x, 0, method=Diff.loss_fn)
    sd = _roundtrip(model, v["params"])  # strict bijection at nrb=1
    assert "backbone.downblocks.0.block1.2.weight" in sd
    assert "backbone.downblocks.1.main.weight" in sd  # DownSample
    assert "backbone.downblocks.2.block1.2.weight" in sd
    assert "backbone.upblocks.2.main.weight" in sd  # UpSample after 2
    assert "backbone.upblocks.4.block1.0.weight" in sd
    # no nrb=2-shaped indices may leak in
    assert "backbone.downblocks.2.main.weight" not in sd
    assert "backbone.upblocks.3.main.weight" not in sd


def test_latent_unet_roundtrip():
    model = Diff(T=8, shape=(1, 8, 8), is_latent=True)
    x = jnp.zeros((2, 8))
    v = model.init(RNGS, x, 0, method=Diff.loss_fn)
    sd = _roundtrip(model, v["params"])
    assert "backbone.time_embed.0.weight" in sd
    assert "backbone.time_embed.2.weight" in sd
    assert "backbone.layers.0.linear.weight" in sd
    assert "backbone.layers.1.linear_emb.weight" in sd
    assert "backbone.layers.1.norm.weight" in sd
    assert "backbone.layers.9.linear.weight" in sd
    assert sd["backbone.layers.0.linear.weight"].shape == (32, 8)  # [out,in]


def test_vae_roundtrip_with_decoder_fca_permutation():
    model = VAE(a_dim=4, shape=(1, 8, 8), encoder_channels=32,
                ch_mult=(1, 2), attn=(1,))
    x = jnp.zeros((1, 8, 8, 1))
    v = model.init(RNGS, x, 0, method=VAE.loss_fn)
    sd = _roundtrip(model, v["params"])
    assert "decoder.fc_a.weight" in sd
    assert sd["decoder.fc_a.weight"].shape == (64, 4)  # [C*H*W, a_dim]
    # the functional check: torch-side NCHW reshape of fc_a output must
    # equal our NHWC reshape of the flax kernel's output
    a = np.random.RandomState(0).randn(4).astype(np.float32)
    torch_out = sd["decoder.fc_a.weight"] @ a + sd["decoder.fc_a.bias"]
    torch_img = torch_out.reshape(1, 8, 8)  # C, H, W
    flax_k = np.asarray(v["params"]["decoder"]["fc_a"]["kernel"])
    flax_b = np.asarray(v["params"]["decoder"]["fc_a"]["bias"])
    flax_img = (a @ flax_k + flax_b).reshape(8, 8, 1)  # H, W, C
    np.testing.assert_allclose(
        torch_img.transpose(1, 2, 0), flax_img, atol=1e-6
    )


def test_loaded_params_do_not_alias_source_arrays():
    """load_torch_state_dict must COPY: on the CPU backend jnp.asarray
    can zero-copy alias the incoming numpy arrays, which in real use are
    views of torch tensor storage — an in-place torch mutation after the
    load (optimizer.step()) would then rewrite the jax params."""
    model = Diff(T=8, shape=(1, 8, 8), is_latent=True)
    x = jnp.zeros((2, 8))
    v = model.init(RNGS, x, 0, method=Diff.loss_fn)
    sd = export_torch_state_dict(model, v["params"])
    sd = {k: np.array(a) for k, a in sd.items()}  # writable sources
    loaded = load_torch_state_dict(model, v["params"], sd, strict=True)
    snapshot = jax.tree.map(lambda a: np.array(a), loaded)
    for a in sd.values():
        a += 1.0  # the in-place mutation torch's opt.step() would do
    jax.tree.map(
        lambda want, got: np.testing.assert_array_equal(
            want, np.asarray(got)
        ),
        snapshot, loaded,
    )


def test_load_ignores_dead_crossattn_keys():
    model = Diff(T=8, shape=(1, 8, 8), is_latent=True)
    x = jnp.zeros((2, 8))
    v = model.init(RNGS, x, 0, method=Diff.loss_fn)
    sd = export_torch_state_dict(model, v["params"])
    sd["backbone.crossattn.proj.weight"] = np.zeros((4, 4, 1, 1))
    # non-strict load ignores extras (reference loads strict=False,
    # run.py:233); strict load flags them
    load_torch_state_dict(model, v["params"], sd, strict=False)
    with pytest.raises(KeyError):
        sd2 = dict(sd)
        sd2["backbone.unexpected.weight"] = np.zeros((2, 2))
        load_torch_state_dict(model, v["params"], sd2, strict=True)


def test_conv_transform_semantics_vs_torch():
    """The OIHW<->HWIO transform must make torch.conv2d and flax Conv
    compute the same function (real torch check, not just shape math)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from flax import linen as nn

    from infodiffusion_tpu.interop import conv_from_flax, conv1x1_to_dense

    rng = np.random.RandomState(0)
    x = rng.randn(2, 6, 6, 3).astype(np.float32)  # NHWC
    conv = nn.Conv(5, (3, 3), padding=((1, 1), (1, 1)))
    v = conv.init(jr.PRNGKey(0), jnp.asarray(x))
    flax_out = np.asarray(conv.apply(v, jnp.asarray(x)))

    w_t = torch.from_numpy(
        conv_from_flax(np.asarray(v["params"]["kernel"])).copy()
    )
    b_t = torch.from_numpy(np.array(v["params"]["bias"]))
    x_t = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())  # NCHW
    torch_out = F.conv2d(x_t, w_t, b_t, padding=1).numpy()
    np.testing.assert_allclose(
        torch_out.transpose(0, 2, 3, 1), flax_out, atol=1e-5
    )


def test_conv1x1_dense_equivalence_vs_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    w_torch = rng.randn(5, 3, 1, 1).astype(np.float32)  # [O, I, 1, 1]
    x = rng.randn(2, 4, 4, 3).astype(np.float32)
    dense_k = conv1x1_to_dense_ref(w_torch)
    flax_out = x @ dense_k
    t_out = F.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2).copy()),
        torch.from_numpy(w_torch),
    ).numpy()
    np.testing.assert_allclose(
        t_out.transpose(0, 2, 3, 1), flax_out, atol=1e-5
    )


def conv1x1_to_dense_ref(w):
    from infodiffusion_tpu.interop import conv1x1_to_dense

    return conv1x1_to_dense(w)
