"""NN primitive blocks (layer L0 of SURVEY.md §1).

TPU-native re-design of the reference's ``modules.py``: NHWC layout
(XLA's native conv layout on TPU), Flax linen modules, explicit RNG
plumbing for dropout, and hot blocks (single-head attention, AdaGN
dual-FiLM) routed through ``infodiffusion_tpu.ops`` so they can run as
fused Pallas kernels on TPU with a pure-XLA fallback elsewhere.
"""

from infodiffusion_tpu.nn.embeddings import (
    TimeEmbedding,
    sinusoidal_table,
    timestep_embedding,
)
from infodiffusion_tpu.nn.blocks import (
    AuxResBlock,
    DownSample,
    EncoderResBlock,
    LatentDownSample,
    LatentUpSample,
    MLPLNAct,
    ResBlock,
    UpSample,
)
from infodiffusion_tpu.nn.attention import AttnBlock, CrossAttnBlock

__all__ = [
    "TimeEmbedding",
    "sinusoidal_table",
    "timestep_embedding",
    "ResBlock",
    "AuxResBlock",
    "EncoderResBlock",
    "DownSample",
    "UpSample",
    "LatentDownSample",
    "LatentUpSample",
    "MLPLNAct",
    "AttnBlock",
    "CrossAttnBlock",
]
