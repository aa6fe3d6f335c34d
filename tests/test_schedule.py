"""Unit tests for diffusion schedule constants and step algebra.

Oracles are hand-written numpy implementations of the reference math
(models.py:615-618, sampling.py:23-73), including the quirks: eta=0.01,
x0-from-alpha_prev_bars, zero-noise-at-t0.
"""

import numpy as np
import jax.numpy as jnp

from infodiffusion_tpu.diffusion import (
    make_schedule,
    q_sample,
    ddpm_step,
    ddim_step,
    ddim_reverse_step,
)
from infodiffusion_tpu.diffusion.schedule import strided_ddim_step

BETA1, BETAT, T = 1e-5, 1e-2, 50


def np_schedule():
    betas = np.linspace(BETA1, BETAT, T, dtype=np.float64)
    alphas = 1 - betas
    alpha_bars = np.cumprod(alphas)
    alpha_prev_bars = np.concatenate([[1.0], alpha_bars[:-1]])
    return betas, alphas, alpha_bars, alpha_prev_bars


def test_schedule_constants_match_closed_form():
    sched = make_schedule(BETA1, BETAT, T)
    betas, alphas, alpha_bars, alpha_prev_bars = np_schedule()
    np.testing.assert_allclose(sched.betas, betas, rtol=1e-6)
    np.testing.assert_allclose(sched.alphas, alphas, rtol=1e-6)
    np.testing.assert_allclose(sched.alpha_bars, alpha_bars, rtol=1e-5)
    np.testing.assert_allclose(sched.alpha_prev_bars, alpha_prev_bars, rtol=1e-5)
    assert sched.T == T
    # alpha_prev_bars[0] is exactly 1 (the reference concatenates a literal 1)
    assert float(sched.alpha_prev_bars[0]) == 1.0


def test_q_sample_matches_oracle():
    sched = make_schedule(BETA1, BETAT, T)
    _, _, alpha_bars, _ = np_schedule()
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(4, 8, 8, 3)).astype(np.float32)
    eps = rng.normal(size=x0.shape).astype(np.float32)
    t = np.array([0, 7, 23, T - 1])
    got = q_sample(sched, jnp.asarray(x0), jnp.asarray(t), jnp.asarray(eps))
    ab = alpha_bars[t][:, None, None, None]
    want = np.sqrt(ab) * x0 + np.sqrt(1 - ab) * eps
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ddpm_step_matches_oracle():
    sched = make_schedule(BETA1, BETAT, T)
    betas, alphas, alpha_bars, alpha_prev_bars = np_schedule()
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 4, 1)).astype(np.float32)
    eps = rng.normal(size=x.shape).astype(np.float32)
    noise = rng.normal(size=x.shape).astype(np.float32)
    for idx in [T - 1, 17, 1]:
        got = ddpm_step(
            sched, jnp.asarray(x), jnp.asarray(idx), jnp.asarray(eps),
            jnp.asarray(noise),
        )
        stb = np.sqrt(
            (1 - alpha_prev_bars[idx]) / (1 - alpha_bars[idx]) * betas[idx]
        )
        mu = np.sqrt(1 / alphas[idx]) * (
            x - betas[idx] / np.sqrt(1 - alpha_bars[idx]) * eps
        )
        want = mu + stb * noise
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # idx == 0 with zero noise: pure posterior mean
    got0 = ddpm_step(
        sched, jnp.asarray(x), jnp.asarray(0), jnp.asarray(eps),
        jnp.zeros_like(jnp.asarray(x)),
    )
    mu0 = np.sqrt(1 / alphas[0]) * (
        x - betas[0] / np.sqrt(1 - alpha_bars[0]) * eps
    )
    np.testing.assert_allclose(got0, mu0, rtol=1e-4, atol=1e-5)


def test_ddim_step_matches_oracle_including_quirks():
    """eta=0.01 fixed and x0 estimated from alpha_prev_bars[idx]
    (reference: sampling.py:45,52)."""
    sched = make_schedule(BETA1, BETAT, T)
    betas, _, alpha_bars, alpha_prev_bars = np_schedule()
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 4, 4, 1)).astype(np.float32)
    eps = rng.normal(size=x.shape).astype(np.float32)
    noise = rng.normal(size=x.shape).astype(np.float32)
    eta = 0.01
    for idx in [T - 1, 9, 1]:
        got = ddim_step(
            sched, jnp.asarray(x), jnp.asarray(idx), jnp.asarray(eps),
            jnp.asarray(noise),
        )
        x0 = (x - np.sqrt(1 - alpha_prev_bars[idx]) * eps) / np.sqrt(
            alpha_prev_bars[idx]
        )
        sigma = (
            eta
            * np.sqrt((1 - alpha_prev_bars[idx - 1]) / (1 - alpha_bars[idx - 1]))
            * np.sqrt(betas[idx - 1])
        )
        want = (
            np.sqrt(alpha_prev_bars[idx - 1]) * x0
            + np.sqrt(1 - alpha_prev_bars[idx - 1] - sigma**2) * eps
            + sigma * noise
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # idx == 0 returns the x0 estimate; with apb[0] == 1 that is x itself
    got0 = ddim_step(
        sched, jnp.asarray(x), jnp.asarray(0), jnp.asarray(eps),
        jnp.asarray(noise),
    )
    np.testing.assert_allclose(got0, x, rtol=1e-5, atol=1e-6)


def test_ddim_reverse_step_matches_oracle():
    sched = make_schedule(BETA1, BETAT, T)
    _, _, alpha_bars, alpha_prev_bars = np_schedule()
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 4, 4, 1)).astype(np.float32)
    eps = rng.normal(size=x.shape).astype(np.float32)
    for idx in [1, 10, T - 2]:
        got = ddim_reverse_step(
            sched, jnp.asarray(x), jnp.asarray(idx), jnp.asarray(eps)
        )
        x0 = (x - np.sqrt(1 - alpha_prev_bars[idx]) * eps) / np.sqrt(
            alpha_prev_bars[idx]
        )
        want = (
            np.sqrt(alpha_prev_bars[idx + 1]) * x0
            + np.sqrt(1 - alpha_prev_bars[idx + 1]) * eps
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_strided_ddim_step_deterministic_endpoints():
    sched = make_schedule(BETA1, BETAT, T)
    rng = np.random.default_rng(4)
    x0_true = rng.normal(size=(2, 4, 4, 1)).astype(np.float32)
    eps = rng.normal(size=x0_true.shape).astype(np.float32)
    t = jnp.asarray(T - 1)
    xt = q_sample(sched, jnp.asarray(x0_true), t, jnp.asarray(eps))
    # one giant step t -> -1 with the true eps recovers x0 exactly (eta=0)
    got = strided_ddim_step(
        sched, xt, t, jnp.asarray(-1), jnp.asarray(eps),
        jnp.zeros_like(xt), eta=0.0,
    )
    np.testing.assert_allclose(got, x0_true, rtol=1e-3, atol=1e-4)
