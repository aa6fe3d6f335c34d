"""High-level pipeline facade tests on a tiny trained-from-init model."""

import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from infodiffusion_tpu.config import Config
from infodiffusion_tpu.models import InfoDiff
from infodiffusion_tpu.pipelines import InfoDiffusionPipeline

RNGS = {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
        "reparam": jr.PRNGKey(2), "dropout": jr.PRNGKey(3)}


@pytest.fixture(scope="module")
def pipe():
    cfg = Config(model="diff", dataset="mnist", a_dim=4, diffusion_steps=6,
                 deterministic=True, ch_mult="1,2", attn="1",
                 unets_channels=32, encoder_channels=32)
    cfg = cfg.replace(input_channels=1, input_size=16)
    model = InfoDiff(T=6, a_dim=4, shape=(1, 16, 16), unets_channels=32,
                     encoder_channels=32, epochs=2, ch_mult=(1, 2),
                     attn=(1,))
    x = jnp.zeros((1, 16, 16, 1))
    v = model.init(RNGS, x, 0, method=InfoDiff.loss_fn)
    return InfoDiffusionPipeline(cfg, model, v)


def test_generate_and_fast_path(pipe):
    imgs = pipe.generate(4)
    assert imgs.shape == (4, 16, 16, 1)
    assert np.isfinite(imgs).all() and imgs.min() >= -1 and imgs.max() <= 1
    fast = pipe.generate(4, steps=3)
    assert fast.shape == (4, 16, 16, 1)


def test_encode_invert_reconstruct(pipe):
    x = np.random.RandomState(0).randn(2, 16, 16, 1).astype(np.float32)
    a = pipe.encode(x)
    assert a.shape == (2, 4)
    xT = pipe.invert(x)
    assert xT.shape == x.shape
    rec = pipe.reconstruct(x)
    assert rec.shape == x.shape


def test_traverse_and_interpolate(pipe):
    x = np.random.RandomState(1).randn(1, 16, 16, 1).astype(np.float32)
    rows = pipe.traverse(x, dim=2, etas=[-1.0, 0.0, 1.0])
    assert rows.shape == (3, 16, 16, 1)
    pair = np.random.RandomState(2).randn(2, 16, 16, 1).astype(np.float32)
    out = pipe.interpolate(pair, n=4)
    assert out.shape == (4, 16, 16, 1)
