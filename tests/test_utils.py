"""Priors / helper tests (reference: utils.py:11-47)."""

import numpy as np
import jax.numpy as jnp
import jax.random as jr

from infodiffusion_tpu.utils import cos, gaussian_mixture, slerp, swiss_roll


def test_gaussian_mixture_ring_moments():
    z = np.asarray(gaussian_mixture(jr.PRNGKey(0), 4096, n_dim=4))
    assert z.shape == (4096, 4)
    # points live near a ring of radius ~1.4 per 2-dim pair
    r = np.sqrt(z[:, 0] ** 2 + z[:, 1] ** 2)
    assert 1.0 < r.mean() < 1.9
    # mixture is centered
    assert abs(z.mean()) < 0.1


def test_gaussian_mixture_label_indices():
    lab = jnp.zeros((64,), jnp.int32)  # all label 0 -> centered at (1.4, 0)
    z = np.asarray(gaussian_mixture(jr.PRNGKey(1), 64, n_dim=2,
                                    label_indices=lab))
    assert abs(z[:, 0].mean() - 1.4) < 0.3
    assert abs(z[:, 1].mean()) < 0.2


def test_gaussian_mixture_odd_dim_raises():
    try:
        gaussian_mixture(jr.PRNGKey(0), 4, n_dim=3)
    except ValueError:
        return
    raise AssertionError("expected ValueError for odd n_dim")


def test_swiss_roll_range():
    z = np.asarray(swiss_roll(jr.PRNGKey(0), 2048))
    assert z.shape == (2048, 2)
    # sklearn roll spans roughly [-3, 3] after /5
    assert np.abs(z).max() < 4.0
    assert np.abs(z).max() > 1.0


def test_cos_and_slerp():
    a = jnp.array([1.0, 0.0])
    b = jnp.array([0.0, 1.0])
    assert abs(float(cos(a, b))) < 1e-6
    theta = jnp.arccos(cos(a, b))
    mid = slerp(a, b, 0.5, theta)
    np.testing.assert_allclose(np.asarray(mid), [0.7071, 0.7071], atol=1e-3)
    np.testing.assert_allclose(np.asarray(slerp(a, b, 0.0, theta)),
                               np.asarray(a), atol=1e-6)
