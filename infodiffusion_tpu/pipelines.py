"""High-level inference facade (no reference counterpart — the reference
exposes only the run.py CLI; this is the library-use API a production
user expects on top of the same components).

    from infodiffusion_tpu.pipelines import InfoDiffusionPipeline

    pipe = InfoDiffusionPipeline.from_checkpoint(cfg)     # or from_params
    imgs = pipe.generate(16, steps=100)                   # fast DDIM-N
    a    = pipe.encode(imgs)                              # semantic latents
    rec  = pipe.reconstruct(imgs)                         # reverse-DDIM + resample
    rows = pipe.traverse(imgs[:1], dim=3)                 # latent traversal
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from infodiffusion_tpu.config import Config
from infodiffusion_tpu.diffusion import DiffusionProcess
from infodiffusion_tpu.models import build_model
from infodiffusion_tpu.parallel import make_mesh


class InfoDiffusionPipeline:
    """Sampling / encoding / manipulation over a trained InfoDiff model."""

    def __init__(self, cfg: Config, model, variables, mesh=None,
                 seed: int = 0):
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.process = DiffusionProcess(cfg, model, variables, mesh=mesh)
        self._key = jr.PRNGKey(seed)

    # ------------------------------------------------------------- build

    @classmethod
    def from_checkpoint(cls, cfg: Config, epoch: Optional[int] = None,
                        mesh: Optional[object] = "auto", seed: int = 0):
        from infodiffusion_tpu.runner import _load_model_params

        cfg = cfg.with_dataset_config()
        model = build_model(cfg)
        C, H, W = cfg.shape
        variables = _load_model_params(
            cfg, model, jnp.zeros((1, H, W, C)), epoch=epoch
        )
        if mesh == "auto":
            from infodiffusion_tpu.runner import _mesh

            mesh = _mesh(cfg)
        return cls(cfg, model, variables, mesh=mesh, seed=seed)

    @classmethod
    def from_torch_checkpoint(cls, cfg: Config, pth_path: str,
                              seed: int = 0):
        """Build directly from a reference .pth checkpoint (interop.py)."""
        from infodiffusion_tpu.interop import load_torch_checkpoint

        cfg = cfg.with_dataset_config()
        model = build_model(cfg)
        C, H, W = cfg.shape
        rngs = {
            "params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
            "reparam": jr.PRNGKey(2), "dropout": jr.PRNGKey(3),
        }
        abstract = jax.eval_shape(
            lambda: model.init(
                rngs, jnp.zeros((1, H, W, C)), 0,
                method=type(model).loss_fn,
            )
        )
        params = load_torch_checkpoint(model, abstract["params"], pth_path)
        return cls(cfg, model, {"params": params}, seed=seed)

    def _next_key(self):
        self._key, k = jr.split(self._key)
        return k

    # --------------------------------------------------------------- api

    def generate(self, n: int = 16, a: Optional[jnp.ndarray] = None,
                 steps: Optional[int] = None, key=None) -> np.ndarray:
        """Sample n images; ``steps`` selects fast DDIM-N (None = the
        reference's full-grid sampler)."""
        key = key if key is not None else self._next_key()
        out = self.process.sampling(key, sampling_number=n, a=a,
                                    num_steps=steps)
        return np.clip(np.asarray(out, np.float32), -1.0, 1.0)

    def encode(self, x) -> np.ndarray:
        """Images -> semantic latents (the reference's save_latent pick:
        mu when KLD is on, else the deterministic a; run.py:429-438)."""
        a, _aq, mu, _lv = self.model.apply(
            self.variables, jnp.asarray(x), method=type(self.model).encode,
            sample=False,
        )
        # f32 at the API boundary (under --bf16 the encoder emits bf16)
        return np.asarray(mu if self.cfg.kld_weight != 0 else a,
                          dtype=np.float32)

    def invert(self, x, a=None) -> np.ndarray:
        """Deterministic reverse-DDIM encoding x0 -> xT."""
        a = jnp.asarray(a) if a is not None else jnp.asarray(self.encode(x))
        return np.asarray(self.process.reverse_sampling(jnp.asarray(x), a))

    def reconstruct(self, x, steps: Optional[int] = None) -> np.ndarray:
        """x -> (a, xT) -> x̂ (the latent_quality round trip)."""
        a = jnp.asarray(self.encode(x))
        xT = jnp.asarray(self.invert(x, a))
        out = self.process.sampling(self._next_key(), xT=xT, a=a,
                                    num_steps=steps)
        return np.clip(np.asarray(out, np.float32), -1.0, 1.0)

    def traverse(self, x, dim: int, etas=None,
                 steps: Optional[int] = None) -> np.ndarray:
        """Latent traversal of one image along ``dim`` (the disentangle
        mode's inner loop; reference: run.py:396-414)."""
        etas = list(
            etas if etas is not None
            else [-1.5, -1.2, -0.9, -0.6, -0.3, 0.0, 0.3, 0.6, 0.9, 1.2, 1.5]
        )
        a = jnp.asarray(self.encode(x))
        xT = jnp.asarray(self.invert(x, a))
        xT = jnp.tile(xT, (len(etas), 1, 1, 1))
        a_batch = jnp.tile(a, (len(etas), 1)).at[:, dim].set(
            jnp.asarray(etas)
        )
        out = self.process.sampling(self._next_key(), xT=xT, a=a_batch,
                                    num_steps=steps)
        return np.clip(np.asarray(out, np.float32), -1.0, 1.0)

    def interpolate(self, x_pair, n: int = 10,
                    steps: Optional[int] = None) -> np.ndarray:
        """Slerp interpolation between two images (interpolate mode;
        reference: run.py:444-481)."""
        from infodiffusion_tpu.utils import cos

        x_pair = jnp.asarray(x_pair)
        assert x_pair.shape[0] == 2
        a = jnp.asarray(self.encode(x_pair))
        xT = jnp.asarray(self.invert(x_pair, a))
        theta = jnp.arccos(cos(xT[0], xT[1]))
        etas = jnp.linspace(0.0, 1.0, n)
        intp_x = jnp.stack([
            (jnp.sin((1 - e) * theta) * xT[0] + jnp.sin(e * theta) * xT[1])
            / jnp.sin(theta) for e in etas
        ])
        intp_a = jnp.stack([
            jnp.cos(e * jnp.pi / 2) * a[0] + jnp.sin(e * jnp.pi / 2) * a[1]
            for e in etas
        ])
        out = self.process.sampling(self._next_key(), xT=intp_x, a=intp_a,
                                    num_steps=steps)
        return np.clip(np.asarray(out, np.float32), -1.0, 1.0)
