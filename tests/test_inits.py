"""Initializer-scheme tests (PARITY.md Q19/Q20; reference:
modules.py:241-245, models.py:56-60)."""

import numpy as np
import jax.numpy as jnp
import jax.random as jr

from infodiffusion_tpu.models import UNet


def test_tail_conv_near_zero_init_and_head_xavier():
    """The UNet tail conv keeps xavier gain 1e-5 (its init runs *after*
    the block loop in the reference, models.py:59); the head is plain
    xavier; attention projections end up plain xavier because the
    enclosing ResBlock re-initializes them (modules.py:241-245)."""
    m = UNet(T=8, ch=32, ch_mult=(1, 2), attn=(1,), out_ch=1)
    x = jnp.zeros((1, 16, 16, 1))
    v = m.init({"params": jr.PRNGKey(0)}, x, jnp.zeros((1,), jnp.int32))
    p = v["params"]["unet"]
    tail = np.asarray(p["tail_conv"]["kernel"])
    head = np.asarray(p["head"]["kernel"])
    assert np.abs(tail).max() < 1e-4  # gain 1e-5 xavier
    assert np.abs(head).max() > 1e-3  # plain xavier

    # attention projections: plain xavier, NOT the 1e-5 the reference's
    # AttnBlock sets before its parent overwrites it (PARITY Q19)
    attn = p["downblock_2"]["attn"] if "downblock_2" in p else None
    if attn is None:
        for k in p:
            if k.startswith("downblock") and "attn" in p[k]:
                attn = p[k]["attn"]
                break
    assert attn is not None
    assert np.abs(np.asarray(attn["proj"]["kernel"])).max() > 1e-3

    # biases zero everywhere
    assert np.all(np.asarray(p["head"]["bias"]) == 0)
    assert np.all(np.asarray(p["tail_conv"]["bias"]) == 0)
