"""Hot-path ops: fused-kernel tier (SURVEY.md §2.2).

The reference has no native code; its hot blocks are plain torch ops.
Here each hot op has a reference XLA implementation, and two of them
also have an opt-in fused Pallas TPU kernel behind the same signature:

- ``adagn``: GroupNorm + N FiLM modulations fused (the AdaGN double
  modulate of AuxResBlock, reference: modules.py:312-318). XLA + Pallas.
- ``single_head_attention``: softmax(q k^T / sqrt(C)) v over H*W tokens
  (reference: modules.py:145-164). XLA + Pallas.
- ``compute_mmd`` / ``compute_kernel``: the InfoVAE MMD with the
  reference's /dim^2 bandwidth quirk (reference: utils.py:74-90),
  formulated as dot-generals on the MXU. XLA only — no Pallas kernel
  exists for MMD (it is already a single fused reduction under XLA).

A fourth kernel lives in ``ops/pallas/latent_mlp.py``: the whole
LatentUNet forward fused into one ``pallas_call`` (all 10 layers, weights
double-buffered HBM->VMEM, batch tiled over a grid), used by
``LatentDiffusionProcess``. It has its OWN opt-in
(``INFODIFF_ENABLE_FUSED_LATENT=1``) because XLA wins ~10% on the latent
trajectory when params are passed as jit arguments (see
``use_fused_latent`` for the measurement-trap story).

Set ``INFODIFF_DISABLE_PALLAS=1`` to force the XLA paths everywhere.
"""

from infodiffusion_tpu.ops.norm import adagn, group_norm
from infodiffusion_tpu.ops.attention import single_head_attention
from infodiffusion_tpu.ops.mmd import compute_kernel, compute_mmd

__all__ = [
    "adagn",
    "group_norm",
    "single_head_attention",
    "compute_kernel",
    "compute_mmd",
]
