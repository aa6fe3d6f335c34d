"""Priors, slerp helper, console meters, seeding (reference: utils.py).

The priors are device-side JAX reimplementations of the reference's host
numpy samplers (utils.py:11-40) so prior draws live inside the jitted
train step instead of forcing a host round-trip per batch.
"""

from __future__ import annotations

import random as _pyrandom

import jax.numpy as jnp
import jax.random as jr
import numpy as np


def gaussian_mixture(
    key,
    batch_size: int,
    n_dim: int = 2,
    n_labels: int = 10,
    x_var: float = 0.5,
    y_var: float = 0.1,
    shift: float = 1.4,
    label_indices=None,
) -> jnp.ndarray:
    """10 Gaussians on a ring, sampled per 2-dim pair, vectorized
    (reference: utils.py:11-37 — note np.random.normal's second arg is the
    *std*, so x_var/y_var are stds here too)."""
    if n_dim % 2 != 0:
        raise ValueError("n_dim must be a multiple of 2.")
    pairs = n_dim // 2
    kx, ky, kl = jr.split(key, 3)
    x = jr.normal(kx, (batch_size, pairs)) * x_var
    y = jr.normal(ky, (batch_size, pairs)) * y_var
    if label_indices is not None:
        label = jnp.broadcast_to(
            jnp.asarray(label_indices)[:, None], (batch_size, pairs)
        )
    else:
        label = jr.randint(kl, (batch_size, pairs), 0, n_labels)
    r = 2.0 * jnp.pi / n_labels * label.astype(jnp.float32)
    c, s = jnp.cos(r), jnp.sin(r)
    new_x = x * c - y * s + shift * c
    new_y = x * s + y * c + shift * s
    # interleave pairs: [x0, y0, x1, y1, ...]
    z = jnp.stack([new_x, new_y], axis=-1).reshape(batch_size, n_dim)
    return z.astype(jnp.float32)


def swiss_roll(key, batch_size: int, noise: float = 0.5) -> jnp.ndarray:
    """sklearn make_swiss_roll dims [0, 2] / 5, in JAX
    (reference: utils.py:39-40)."""
    ku, kn = jr.split(key)
    t = 1.5 * jnp.pi * (1.0 + 2.0 * jr.uniform(ku, (batch_size,)))
    x = t * jnp.cos(t)
    z = t * jnp.sin(t)
    n = jr.normal(kn, (batch_size, 2)) * noise
    return (jnp.stack([x, z], axis=-1) + n) / 5.0


def cos(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity of two flattened tensors (reference: utils.py:42-47);
    feeds the slerp in interpolate mode (run.py:464)."""
    a = a.reshape(-1)
    b = b.reshape(-1)
    a = a / jnp.linalg.norm(a)
    b = b / jnp.linalg.norm(b)
    return jnp.sum(a * b)


def slerp(x0: jnp.ndarray, x1: jnp.ndarray, e: float, theta) -> jnp.ndarray:
    """sin((1-e)θ)x0 + sin(eθ)x1) / sin(θ) (reference: run.py:473)."""
    return (jnp.sin((1.0 - e) * theta) * x0 + jnp.sin(e * theta) * x1) / jnp.sin(
        theta
    )


def seed_everything(r_seed: int):
    """Seed host RNGs and return the root JAX key (reference: utils.py:64-71;
    JAX determinism comes from explicit key plumbing, not global state)."""
    _pyrandom.seed(r_seed)
    np.random.seed(r_seed)
    return jr.PRNGKey(r_seed)


class AverageMeter:
    """Console meter (reference: utils.py:93-113)."""

    def __init__(self, name: str, fmt: str = ":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count

    def __str__(self):
        fmtstr = "{name} {val" + self.fmt + "} ({avg" + self.fmt + "})"
        return fmtstr.format(**self.__dict__)


class ProgressMeter:
    """Console progress line (reference: utils.py:116-130)."""

    def __init__(self, num_batches: int, meters, prefix: str = ""):
        self.batch_fmtstr = self._get_batch_fmtstr(num_batches)
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int):
        entries = [self.prefix + self.batch_fmtstr.format(batch)]
        entries += [str(m) for m in self.meters]
        print("\r" + "\t".join(entries), end="")

    @staticmethod
    def _get_batch_fmtstr(num_batches: int):
        num_digits = len(str(num_batches // 1))
        fmt = "{:" + str(num_digits) + "d}"
        return "[" + fmt + "/" + fmt.format(num_batches) + "]"
