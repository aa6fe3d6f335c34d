"""InfoDiffusion-TPU: a TPU-native (JAX/Flax/pjit/Pallas) framework with the
capabilities of isjakewong/InfoDiffusion (ICML 2023).

Layering (mirrors the reference's logical layers, re-designed JAX-first):

- ``diffusion``: noise schedules and single-step DDPM/DDIM algebra as pure
  functions (reference: models.py:615-618, sampling.py:23-87).
- ``nn``: Flax NN blocks -- time embedding, ResBlocks with AdaGN, attention,
  up/down sampling (reference: modules.py).
- ``models``: backbones (UNet / AuxiliaryUNet / BottleneckAuxUNet /
  LatentUNet / Encoder / Decoder) and model families (InfoDiff / Diff / VAE)
  owning the losses (reference: models.py).
- ``samplers``: whole-trajectory samplers as single ``lax.scan`` programs --
  no host round-trips (reference: sampling.py drives T=1000 Python steps).
- ``ops``: Pallas TPU kernels for the hot blocks (fused attention, fused
  GroupNorm+FiLM, MMD) with pure-XLA fallbacks.
- ``parallel``: device-mesh utilities; data-parallel train steps via
  ``jax.sharding`` + jit (the reference is single-GPU only).
- ``train`` / ``data`` / ``eval`` / ``metrics`` / ``utils`` / ``cli``:
  training loop, input pipeline, eval modes, DCI/TAD/FID metrics, CLI with
  flag-for-flag parity with the reference's run.py.
"""

__version__ = "0.1.0"
