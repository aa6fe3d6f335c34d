"""Model wrappers owning the diffusion schedule and the loss
(reference: models.py:605-859).

``InfoDiff`` / ``Diff`` / ``VAE`` are Flax modules exposing the same
logical surface as the reference's nn.Modules:

- ``__call__(x, t, a?)``   : eps prediction (the samplers' entry point;
  the reference's idx-given eval path, models.py:705-707, maps to the
  caller passing an explicit t array and pre-noised x).
- ``train_forward(x)``     : sample t ~ U[0,T), re-noise, encode, route
  the deterministic ``a`` vs reparametrized ``a_q`` to the backbone by
  the regularizer-weight table (reference: models.py:714-721).
- ``loss_fn(x, curr_epoch)``: full training loss incl. recon/MMD/KLD
  terms with every reference quirk preserved (see infodiff_loss_terms).

RNG streams: 'noise' (t, eps, prior draws), 'reparam' (encoder
posterior), 'dropout'.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import jax.random as jr
from flax import linen as nn

from infodiffusion_tpu.diffusion.schedule import Schedule, make_schedule, q_sample
from infodiffusion_tpu.models.latent_unet import LatentUNet
from infodiffusion_tpu.models.unet import (
    AuxiliaryUNet,
    BottleneckAuxUNet,
    Decoder,
    Encoder,
    UNet,
)
from infodiffusion_tpu.nn.initializers import zeros
from infodiffusion_tpu.ops import compute_mmd
from infodiffusion_tpu.utils import gaussian_mixture, swiss_roll


def pick_ch_mult(model: str, input_size: int) -> Tuple[int, ...]:
    """The reference's hardcoded ch_mult table: InfoDiff uses [1,2,2,2]
    (28px: [1,2,4]); Diff/VAE use [1,2,4,8] (reference: models.py:619-622,
    743-746, 785-788)."""
    if input_size == 28:
        return (1, 2, 4)
    return (1, 2, 2, 2) if model == "diff" else (1, 2, 4, 8)


def _draw_prior(key, prior: str, like: jnp.ndarray) -> jnp.ndarray:
    """Device-side prior draws (the reference does 10mix/roll on host numpy,
    utils.py:11-40 / models.py:652-658; here they are jitted JAX)."""
    B, d = like.shape
    if prior == "regular":
        return jr.normal(key, like.shape, dtype=like.dtype)
    if prior == "10mix":
        return gaussian_mixture(key, B, d).astype(like.dtype)
    if prior == "roll":
        return swiss_roll(key, B).astype(like.dtype)
    raise ValueError(prior)


def _kld_sum(mu, log_var):
    """KLD summed over batch — the InfoDiff convention
    (reference: models.py:663)."""
    per_ex = -0.5 * jnp.sum(
        1.0 + log_var - jnp.square(mu) - jnp.exp(log_var), axis=1
    )
    return jnp.sum(per_ex)


def _kld_mean(mu, log_var):
    """KLD meaned over batch — the VAE convention (reference: models.py:809)."""
    per_ex = -0.5 * jnp.sum(
        1.0 + log_var - jnp.square(mu) - jnp.exp(log_var), axis=1
    )
    return jnp.mean(per_ex)


def _capacity(C_max: float, epochs: int, curr_epoch) -> jnp.ndarray:
    """C = clamp(C_max * epoch / epochs, 0, C_max) (reference: models.py:666-668)."""
    c = jnp.asarray(C_max, jnp.float32) * curr_epoch / epochs
    return jnp.clip(c, 0.0, C_max)


class InfoDiff(nn.Module):
    """Auxiliary-variable diffusion model (reference: models.py:605-723)."""

    T: int
    a_dim: int
    shape: Tuple[int, int, int]  # (C, H, W)
    unets_channels: int = 64
    encoder_channels: int = 64
    beta1: float = 1e-5
    betaT: float = 1e-2
    mmd_weight: float = 0.1
    kld_weight: float = 0.0
    is_bottleneck: bool = False
    prior: str = "regular"
    use_C: bool = False
    C_max: float = 25.0
    epochs: int = 20
    attn: Tuple[int, ...] = (2,)
    ch_mult: Optional[Tuple[int, ...]] = None  # None -> reference table
    num_res_blocks: int = 2  # reference fixes 2 (models.py:19); exposed so
    # interop.param_key_map reads ONE source of truth for the skeleton
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        ch_mult = self.ch_mult or pick_ch_mult("diff", self.shape[1])
        kw = dict(
            T=self.T, a_dim=self.a_dim, ch=self.unets_channels,
            ch_mult=ch_mult, out_ch=self.shape[0], attn=self.attn,
            num_res_blocks=self.num_res_blocks, dtype=self.dtype,
        )
        if self.is_bottleneck:
            self.backbone = BottleneckAuxUNet(**kw)
        else:
            self.backbone = AuxiliaryUNet(**kw)
        self.encoder = Encoder(
            a_dim=self.a_dim, shape=self.shape, ch=self.encoder_channels,
            ch_mult=ch_mult, attn=self.attn,
            num_res_blocks=self.num_res_blocks, dtype=self.dtype,
        )
        self.sched: Schedule = make_schedule(self.beta1, self.betaT, self.T)

    def __call__(self, x, t, a, *, deterministic: bool = True):
        """eps prediction on (already noised) x at timesteps t."""
        return self.backbone(x, t, a, deterministic=deterministic)

    def encode(self, x, *, deterministic: bool = True, sample: bool = True):
        return self.encoder(x, deterministic=deterministic, sample=sample)

    def _route_latent(self, a, a_q):
        """a vs a_q selection table (reference: models.py:714-721)."""
        if self.mmd_weight != 0 and self.kld_weight != 0:
            return a_q
        if self.mmd_weight == 0 and self.kld_weight == 0:
            return a
        return a if self.mmd_weight != 0 else a_q

    def train_forward(self, x, *, deterministic: bool = False,
                      t=None, eps=None, reparam_eps=None):
        """Random-t re-noising + encoding (reference: models.py:698-723).

        ``t``/``eps``/``reparam_eps`` optionally inject the random draws
        (cross-implementation parity tests, deterministic debugging);
        by default they come from the 'noise'/'reparam' RNG streams.
        """
        B = x.shape[0]
        if t is None or eps is None:
            key = self.make_rng("noise")
            k_t, k_eps = jr.split(key)
            if t is None:
                t = jr.randint(k_t, (B,), 0, self.T)
            if eps is None:
                eps = jr.normal(k_eps, x.shape, dtype=x.dtype)
        x_tilde = q_sample(self.sched, x, t, eps)
        a, a_q, mu, log_var = self.encoder(
            x, deterministic=deterministic, sample=True,
            reparam_eps=reparam_eps,
        )
        cond = self._route_latent(a, a_q)
        out = self.backbone(x_tilde, t, cond, deterministic=deterministic)
        return out, eps, a, mu, log_var

    def loss_fn(self, x, curr_epoch=0, *, deterministic: bool = False,
                t=None, eps=None, reparam_eps=None, prior_samples=None):
        """Training loss (reference: models.py:632-696). Returns
        (loss, aux dict of per-term values for the metrics writer).

        The keyword-only ``t``/``eps``/``reparam_eps``/``prior_samples``
        inject the four random draws for parity testing against the
        torch reference on identical numbers."""
        out, eps, a, mu, log_var = self.train_forward(
            x, deterministic=deterministic, t=t, eps=eps,
            reparam_eps=reparam_eps,
        )
        out32 = out.astype(jnp.float32)
        eps32 = eps.astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        loss_denoise = jnp.mean(jnp.square(out32 - eps32))
        # reconstruction: x0 re-estimated from *clean* x with the t=0
        # schedule entries — a reference quirk preserved verbatim
        # (reference: models.py:644-646).
        s = self.sched
        x0_est = jnp.sqrt(1.0 / s.alphas[0]) * (
            x32 - s.betas[0] / jnp.sqrt(1.0 - s.alpha_bars[0]) * out32
        )
        loss_rec = jnp.mean(jnp.square(x0_est - x32)) / self.T
        loss = loss_denoise + loss_rec
        aux = {"denoise": loss_denoise, "recon": loss_rec}

        mmd_w, kld_w = self.mmd_weight, self.kld_weight
        if mmd_w != 0:
            # MMD target is mu when KLD is also on, else the deterministic a
            # (reference: models.py:659 vs 682).
            target = mu if kld_w != 0 else a
            if prior_samples is None:
                prior_key = self.make_rng("noise")
                true_samples = _draw_prior(prior_key, self.prior, target)
            else:
                true_samples = prior_samples
            loss_mmd = compute_mmd(
                true_samples.astype(jnp.float32), target.astype(jnp.float32)
            )
            loss = loss + mmd_w * loss_mmd
            aux["mmd"] = loss_mmd
        if kld_w != 0:
            kld = _kld_sum(mu.astype(jnp.float32), log_var.astype(jnp.float32))
            if self.use_C:
                C = _capacity(self.C_max, self.epochs, curr_epoch)
                loss = loss + kld_w * jnp.abs(kld - C)
            else:
                loss = loss + kld_w * kld
            aux["kld"] = kld
        return loss, aux


# LatentUNet architecture the latent Diff wrapper instantiates
# (reference: models.py:745-752 passes these to MLPSkipNet). The --pp
# pipelined replica (parallel/pp.py) reads the SAME constants, so the
# two paths cannot drift if one side changes.
LATENT_BACKBONE_KWARGS = dict(num_layers=10, dropout=0.1)


class Diff(nn.Module):
    """Vanilla / latent DDPM (reference: models.py:726-779)."""

    T: int
    shape: Tuple[int, int, int]  # (C, H, W) images, or (1, a_dim, a_dim) latent
    unets_channels: int = 64
    beta1: float = 1e-5
    betaT: float = 1e-2
    is_latent: bool = False
    attn: Tuple[int, ...] = (2,)
    ch_mult: Optional[Tuple[int, ...]] = None  # None -> reference table
    num_res_blocks: int = 2
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.is_latent:
            self.backbone = LatentUNet(
                T=self.T, shape=self.shape, activation="silu",
                dtype=self.dtype, **LATENT_BACKBONE_KWARGS,
            )
        else:
            ch_mult = self.ch_mult or pick_ch_mult("vanilla", self.shape[1])
            self.backbone = UNet(
                T=self.T, ch=self.unets_channels, ch_mult=ch_mult,
                attn=self.attn, out_ch=self.shape[0],
                num_res_blocks=self.num_res_blocks, dtype=self.dtype,
            )
        self.sched: Schedule = make_schedule(self.beta1, self.betaT, self.T)

    def __call__(self, x, t, *, deterministic: bool = True):
        return self.backbone(x, t, deterministic=deterministic)

    def train_forward(self, x, *, deterministic: bool = False,
                      t=None, eps=None):
        B = x.shape[0]
        if t is None or eps is None:
            key = self.make_rng("noise")
            k_t, k_eps = jr.split(key)
            if t is None:
                t = jr.randint(k_t, (B,), 0, self.T)
            if eps is None:
                eps = jr.normal(k_eps, x.shape, dtype=x.dtype)
        # q_sample broadcasts over both image [B,H,W,C] and latent [B,d]
        # (reference: models.py:768-771).
        x_tilde = q_sample(self.sched, x, t, eps)
        out = self.backbone(x_tilde, t, deterministic=deterministic)
        return out, eps

    def loss_fn(self, x, curr_epoch=0, *, deterministic: bool = False,
                t=None, eps=None):
        """eps-MSE only (reference: models.py:753-762). ``t``/``eps``
        optionally inject the draws (parity tests)."""
        out, eps = self.train_forward(
            x, deterministic=deterministic, t=t, eps=eps
        )
        loss = jnp.mean(
            jnp.square(out.astype(jnp.float32) - eps.astype(jnp.float32))
        )
        return loss, {"denoise": loss}


class VAE(nn.Module):
    """VAE / beta-VAE / InfoVAE — one class switched by the regularizer
    weights, like the reference (reference: models.py:781-833)."""

    a_dim: int
    shape: Tuple[int, int, int]
    encoder_channels: int = 64
    mmd_weight: float = 0.1
    kld_weight: float = 0.0
    use_C: bool = False
    C_max: float = 25.0
    epochs: int = 20
    attn: Tuple[int, ...] = (2,)
    ch_mult: Optional[Tuple[int, ...]] = None  # None -> reference table
    num_res_blocks: int = 2
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        ch_mult = self.ch_mult or pick_ch_mult("vae", self.shape[1])
        kw = dict(
            a_dim=self.a_dim, shape=self.shape, ch=self.encoder_channels,
            ch_mult=ch_mult, attn=self.attn,
            num_res_blocks=self.num_res_blocks, dtype=self.dtype,
        )
        self.encoder = Encoder(**kw)
        self.decoder = Decoder(**kw)

    def encode(self, x, *, deterministic: bool = True, sample: bool = True):
        return self.encoder(x, deterministic=deterministic, sample=sample)

    def decode(self, a, *, deterministic: bool = True):
        return self.decoder(a, deterministic=deterministic)

    def __call__(self, x, *, deterministic: bool = True, reparam_eps=None):
        a, a_q, mu, log_var = self.encoder(
            x, deterministic=deterministic, reparam_eps=reparam_eps
        )
        # decode from a only when *no* regularizer is active
        # (reference: models.py:824-831).
        z = a if (self.mmd_weight == 0 and self.kld_weight == 0) else a_q
        rec = self.decoder(z, deterministic=deterministic)
        return rec, a_q, mu, log_var

    def loss_fn(self, x, curr_epoch=0, *, deterministic: bool = False,
                reparam_eps=None, prior_samples=None):
        """Recon MSE + MMD(N(0,I), a_q) or batch-mean KLD
        (reference: models.py:795-819 — note the VAE's MMD always draws a
        regular Gaussian prior and targets a_q, unlike InfoDiff).
        ``reparam_eps``/``prior_samples`` inject the draws (parity tests)."""
        rec, a_q, mu, log_var = self(
            x, deterministic=deterministic, reparam_eps=reparam_eps
        )
        loss = jnp.mean(
            jnp.square(rec.astype(jnp.float32) - x.astype(jnp.float32))
        )
        aux = {"recon": loss}
        if self.mmd_weight != 0:
            if prior_samples is not None:
                true_samples = prior_samples
            else:
                key = self.make_rng("noise")
                true_samples = jr.normal(key, a_q.shape, dtype=jnp.float32)
            loss_mmd = compute_mmd(true_samples, a_q.astype(jnp.float32))
            loss = loss + self.mmd_weight * loss_mmd
            aux["mmd"] = loss_mmd
        elif self.kld_weight != 0:
            kld = _kld_mean(mu.astype(jnp.float32), log_var.astype(jnp.float32))
            if self.use_C:
                C = _capacity(self.C_max, self.epochs, curr_epoch)
                loss = loss + self.kld_weight * jnp.abs(kld - C)
            else:
                loss = loss + self.kld_weight * kld
            aux["kld"] = kld
        return loss, aux


class FeatureClassifier(nn.Module):
    """3-layer MLP attribute classifier — defined-but-unused in the
    reference; kept for inventory parity (reference: models.py:836-859)."""

    output_dim: int = 40
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(512, bias_init=zeros, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5)(x, deterministic=deterministic)
        x = nn.Dense(128, bias_init=zeros, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5)(x, deterministic=deterministic)
        x = nn.Dense(self.output_dim, bias_init=zeros, dtype=self.dtype)(x)
        return nn.sigmoid(x)


def build_model(cfg, *, latent: bool = False, dtype=None):
    """Instantiate the wrapper selected by ``cfg.model``
    (reference: run.py:171-176, 491-492). ``cfg.ch_mult``/``cfg.attn``
    override the reference's hardcoded architecture table when set."""
    if dtype is None:
        dtype = jnp.bfloat16 if getattr(cfg, "bf16", False) else jnp.float32
    shape = cfg.latent_shape if latent else cfg.shape
    ch_mult = _parse_ints(getattr(cfg, "ch_mult", None))
    attn = _parse_ints(getattr(cfg, "attn", None)) or (2,)
    if latent or cfg.model == "vanilla":
        return Diff(
            T=cfg.diffusion_steps, shape=shape,
            unets_channels=cfg.unets_channels, beta1=cfg.beta1,
            betaT=cfg.betaT, is_latent=latent or cfg.is_latent,
            attn=attn, ch_mult=ch_mult, dtype=dtype,
        )
    if cfg.model == "diff":
        return InfoDiff(
            T=cfg.diffusion_steps, a_dim=cfg.a_dim, shape=shape,
            unets_channels=cfg.unets_channels,
            encoder_channels=cfg.encoder_channels, beta1=cfg.beta1,
            betaT=cfg.betaT, mmd_weight=cfg.mmd_weight,
            kld_weight=cfg.kld_weight, is_bottleneck=cfg.is_bottleneck,
            prior=cfg.prior, use_C=cfg.use_C, C_max=cfg.C_max,
            epochs=cfg.epochs, attn=attn, ch_mult=ch_mult, dtype=dtype,
        )
    if cfg.model == "vae":
        return VAE(
            a_dim=cfg.a_dim, shape=shape,
            encoder_channels=cfg.encoder_channels,
            mmd_weight=cfg.mmd_weight, kld_weight=cfg.kld_weight,
            use_C=cfg.use_C, C_max=cfg.C_max, epochs=cfg.epochs,
            attn=attn, ch_mult=ch_mult, dtype=dtype,
        )
    raise ValueError(cfg.model)


def _parse_ints(v):
    if v is None or v == "":
        return None
    if isinstance(v, (tuple, list)):
        return tuple(int(i) for i in v)
    return tuple(int(i) for i in str(v).split(","))
