"""MMD with the reference's RBF-ish kernel, MXU-formulated.

The reference kernel is ``exp(-mean((x_i - y_j)^2, dim)/dim)`` — the mean
already divides by dim and then divides by dim *again*, giving an
effective bandwidth of dim^2. This quirk is preserved for loss parity
(reference: utils.py:74-90; SURVEY.md §C26).

Instead of the reference's O(B^2 d) tiled subtraction, the pairwise
squared distances are computed with the polarization identity
``|x-y|^2 = |x|^2 + |y|^2 - 2 x.y`` so the dominant cost is one [B,d]x[d,B]
matmul on the MXU. Accumulation is f32.
"""

from __future__ import annotations

import jax.numpy as jnp


def _pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xx = jnp.sum(x * x, axis=1)[:, None]
    yy = jnp.sum(y * y, axis=1)[None, :]
    xy = jnp.dot(x, y.T, preferred_element_type=jnp.float32)
    return jnp.maximum(xx + yy - 2.0 * xy, 0.0)


def compute_kernel(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """k(x_i, y_j) = exp(-|x_i - y_j|^2 / dim^2) (reference: utils.py:74-83)."""
    dim = x.shape[1]
    return jnp.exp(-_pairwise_sqdist(x, y) / (dim * dim))


def compute_mmd(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """MMD^2 estimate incl. diagonal terms, like the reference
    (reference: utils.py:85-90)."""
    return (
        jnp.mean(compute_kernel(x, x))
        + jnp.mean(compute_kernel(y, y))
        - 2.0 * jnp.mean(compute_kernel(x, y))
    )
