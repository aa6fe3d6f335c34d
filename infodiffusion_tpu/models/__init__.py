"""Backbones and model wrappers (layer L1 of SURVEY.md §1)."""

from infodiffusion_tpu.models.unet import (
    AuxiliaryUNet,
    BottleneckAuxUNet,
    Decoder,
    Encoder,
    UNet,
)
from infodiffusion_tpu.models.latent_unet import LatentUNet
from infodiffusion_tpu.models.wrappers import (
    Diff,
    FeatureClassifier,
    InfoDiff,
    VAE,
    build_model,
    pick_ch_mult,
)

__all__ = [
    "UNet",
    "AuxiliaryUNet",
    "BottleneckAuxUNet",
    "Encoder",
    "Decoder",
    "LatentUNet",
    "InfoDiff",
    "Diff",
    "VAE",
    "FeatureClassifier",
    "build_model",
    "pick_ch_mult",
]
