"""Diffusion noise schedule and single-step algebra as pure functions.

All constants live in one frozen pytree (``Schedule``) computed once in f32
and kept device-resident; the per-step update rules are pure functions of
(schedule, index, state) so whole trajectories compile into a single
``lax.scan`` (vs the reference's host-driven Python loops, sampling.py:27,46).

Parity notes — these deliberately reproduce the reference's exact algebra,
including its quirks (SURVEY.md §7 "fidelity quirks"):

- linear beta grid, ``alpha_bars = cumprod(1-beta)``, ``alpha_prev_bars`` =
  alpha_bars shifted right with a leading 1 (reference: models.py:615-618,
  sampling.py:12-15).
- DDIM sampling uses fixed ``eta = 0.01`` and estimates x0 from
  ``alpha_prev_bars[idx]`` — an off-by-one vs textbook DDIM that the
  reference applies consistently (reference: sampling.py:45,52).
- DDPM posterior uses ``sqrt((1-ᾱ_{t-1})/(1-ᾱ_t)·β_t)`` noise scale and
  zero noise at t=0 (reference: sampling.py:29-37).
- reverse (encoding) DDIM runs idx = 0..T-2 and is a no-op at idx 0
  (reference: sampling.py:62-73).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

DEFAULT_ETA = 0.01  # fixed in the reference (sampling.py:45)


class Schedule(NamedTuple):
    """Device-resident schedule constants, all shape [T] f32."""

    betas: jax.Array
    alphas: jax.Array          # 1 - betas
    alpha_bars: jax.Array      # cumprod(alphas)
    alpha_prev_bars: jax.Array  # [1, alpha_bars[:-1]]

    @property
    def T(self) -> int:
        return self.betas.shape[0]


def make_schedule(beta1: float, betaT: float, T: int) -> Schedule:
    """Linear beta schedule (reference: models.py:615-618)."""
    betas = jnp.linspace(beta1, betaT, T, dtype=jnp.float32)
    alphas = 1.0 - betas
    alpha_bars = jnp.cumprod(alphas)
    alpha_prev_bars = jnp.concatenate(
        [jnp.ones((1,), jnp.float32), alpha_bars[:-1]]
    )
    return Schedule(betas, alphas, alpha_bars, alpha_prev_bars)


def _bcast(coef: jax.Array, like: jax.Array) -> jax.Array:
    """Broadcast a per-example scalar (or scalar) over trailing dims of x."""
    return coef.reshape(coef.shape + (1,) * (like.ndim - coef.ndim))


def q_sample(
    sched: Schedule, x0: jax.Array, t: jax.Array, eps: jax.Array
) -> jax.Array:
    """Forward noising x_t = sqrt(ᾱ_t) x0 + sqrt(1-ᾱ_t) ε
    (reference: models.py:701-704; latent 2-D variant models.py:768-771 is
    covered by the broadcast helper)."""
    ab = _bcast(sched.alpha_bars[t], x0)
    return jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * eps


def predict_x0_from_eps(
    sched: Schedule, x: jax.Array, idx: jax.Array, eps: jax.Array
) -> jax.Array:
    """x0 estimate used by the reference's DDIM/reverse-DDIM steps.

    Quirk preserved: uses ``alpha_prev_bars[idx]``, not ``alpha_bars[idx]``
    (reference: sampling.py:52,71).
    """
    apb = _bcast(sched.alpha_prev_bars[idx], x)
    return (x - jnp.sqrt(1.0 - apb) * eps) / jnp.sqrt(apb)


def ddpm_step(
    sched: Schedule,
    x: jax.Array,
    idx: jax.Array,
    eps_pred: jax.Array,
    noise: jax.Array,
) -> jax.Array:
    """One DDPM ancestral update at timestep ``idx``
    (reference: sampling.py:23-39).

    ``noise`` must be 0 when idx == 0 (the caller masks it; the scan-based
    samplers do this with a where() so shapes stay static).
    """
    beta = _bcast(sched.betas[idx], x)
    alpha = _bcast(sched.alphas[idx], x)
    ab = _bcast(sched.alpha_bars[idx], x)
    apb = _bcast(sched.alpha_prev_bars[idx], x)
    sqrt_tilde_beta = jnp.sqrt((1.0 - apb) / (1.0 - ab) * beta)
    mu = jnp.sqrt(1.0 / alpha) * (x - beta / jnp.sqrt(1.0 - ab) * eps_pred)
    return mu + sqrt_tilde_beta * noise


def ddim_step(
    sched: Schedule,
    x: jax.Array,
    idx: jax.Array,
    eps_pred: jax.Array,
    noise: jax.Array,
    eta: float = DEFAULT_ETA,
) -> jax.Array:
    """One (stochastic, eta=0.01) DDIM update at timestep ``idx``
    (reference: sampling.py:41-60).

    At idx == 0 the update returns the x0 estimate; otherwise it moves to
    ᾱ_{idx-1} with the reference's sigma term. Implemented branch-free for
    lax.scan: both arms are computed and selected by a where on idx.
    """
    x0 = predict_x0_from_eps(sched, x, idx, eps_pred)

    prev = jnp.maximum(idx - 1, 0)
    apb_prev = _bcast(sched.alpha_prev_bars[prev], x)
    ab_prev = _bcast(sched.alpha_bars[prev], x)
    beta_prev = _bcast(sched.betas[prev], x)
    sigma = eta * jnp.sqrt((1.0 - apb_prev) / (1.0 - ab_prev)) * jnp.sqrt(beta_prev)
    x_next = (
        jnp.sqrt(apb_prev) * x0
        + jnp.sqrt(1.0 - apb_prev - sigma**2) * eps_pred
        + sigma * noise
    )
    is_last = _bcast((idx == 0).astype(x.dtype), x)
    return is_last * x0 + (1.0 - is_last) * x_next


def ddim_reverse_step(
    sched: Schedule, x: jax.Array, idx: jax.Array, eps_pred: jax.Array
) -> jax.Array:
    """One deterministic forward-encoding step x_idx -> x_{idx+1}
    (reference: sampling.py:62-73). A no-op at idx == 0 — the caller's scan
    handles that with a where (the reference `yield`s x unchanged there)."""
    x0 = predict_x0_from_eps(sched, x, idx, eps_pred)
    apb_next = _bcast(sched.alpha_prev_bars[idx + 1], x)
    return jnp.sqrt(apb_next) * x0 + jnp.sqrt(1.0 - apb_next) * eps_pred


def strided_ddim_step(
    sched: Schedule,
    x: jax.Array,
    t: jax.Array,
    t_prev: jax.Array,
    eps_pred: jax.Array,
    noise: jax.Array,
    eta: float = 0.0,
) -> jax.Array:
    """Textbook DDIM update from timestep ``t`` to ``t_prev`` (t_prev < t).

    This powers the fast sampler (e.g. DDIM-100) — a capability the
    reference lacks (its samplers always walk the full T grid; SURVEY §C11).
    Uses the standard ᾱ_t (not the reference's prev-bar quirk) because there
    is no reference semantics to match for subsampled grids.

    With ``t_prev == -1`` the step lands on x0 exactly.
    """
    ab_t = _bcast(sched.alpha_bars[t], x)
    ab_prev = _bcast(
        jnp.where(t_prev >= 0, sched.alpha_bars[jnp.maximum(t_prev, 0)], 1.0), x
    )
    x0 = (x - jnp.sqrt(1.0 - ab_t) * eps_pred) / jnp.sqrt(ab_t)
    sigma = (
        eta
        * jnp.sqrt((1.0 - ab_prev) / (1.0 - ab_t))
        * jnp.sqrt(1.0 - ab_t / ab_prev)
    )
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - ab_prev - sigma**2, 0.0)) * eps_pred
    return jnp.sqrt(ab_prev) * x0 + dir_xt + sigma * noise
