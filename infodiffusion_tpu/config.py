"""Experiment configuration.

One dataclass carries the same surface as the reference CLI's ~35 argparse
flags (reference: run.py:25-97, duplicated at eval_disentanglement.py:13-86),
plus TPU-specific knobs that have no reference counterpart (mesh shape,
precision policy, sampler step count).

The per-dataset override table reproduces ``get_dataset_config``
(reference: data.py:63-102): the dataset choice *overwrites* user-supplied
``input_channels / input_size / unets_channels / encoder_channels``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

MODELS = ("diff", "vae", "vanilla")
MODES = (
    "train",
    "eval",
    "eval_fid",
    "save_latent",
    "disentangle",
    "interpolate",
    "save_original_img",
    "latent_quality",
    "train_latent_ddim",
    "plot_latent",
    # extension: a *working* attribute-classification mode. The reference
    # defines FeatureClassifier (models.py:836-859) and an
    # attr_classification artifact branch (run.py:119-120,142-143) and a
    # celeba 3-way split for it (data.py:174-181), but never wires the
    # mode into --mode choices — dead code there, functional here.
    "attr_classification",
)
PRIORS = ("regular", "10mix", "roll")
DATASETS = ("fmnist", "mnist", "celeba", "cifar10", "dsprites", "chairs", "ffhq")

# dataset -> (input_channels, unets_channels, encoder_channels, input_size)
# (reference: data.py:63-102)
DATASET_CONFIG = {
    "fmnist": (1, 32, 32, 32),
    "mnist": (1, 32, 32, 32),
    "dsprites": (1, 32, 32, 32),
    "celeba": (3, 64, 64, 64),
    "cifar10": (3, 64, 64, 32),
    "chairs": (3, 32, 32, 64),
    "ffhq": (3, 64, 64, 64),
}


@dataclasses.dataclass
class Config:
    # --- reference CLI flags (same names and defaults; run.py:25-97) ---
    r_seed: int = 0
    img_id: int = 0
    model: str = "diff"  # {diff, vae, vanilla}
    mode: str = "train"  # one of MODES
    prior: str = "regular"  # {regular, 10mix, roll}
    kld_weight: float = 0.0
    mmd_weight: float = 0.1
    use_C: bool = False
    C_max: float = 25.0
    dataset: str = "mnist"
    img_folder: str = "./imgs"
    log_folder: str = "./logs"
    epochs: int = 20
    save_epochs: int = 5
    batch_size: int = 64
    learning_rate: float = 1e-4
    optimizer: str = "adam"
    model_folder: str = "./models"
    deterministic: bool = False
    input_channels: int = 1
    unets_channels: int = 64
    encoder_channels: int = 64
    input_size: int = 32
    a_dim: int = 32
    beta1: float = 1e-5
    betaT: float = 1e-2
    diffusion_steps: int = 1000
    split_step: int = 500
    sampling_number: int = 16
    data_dir: str = "./data"
    tb_logger: bool = False
    is_latent: bool = False
    is_bottleneck: bool = False
    # accepted-for-script-parity flag (the reference's shell scripts pass
    # --disent_metric though its argparse never defined it; see cli.py)
    disent_metric: str = "tad"

    # --- TPU-native knobs (no reference counterpart) ---
    # Number of sampler steps; None => full T grid like the reference
    # (sampling.py always iterates all T=1000 steps).
    sampling_steps: Optional[int] = None
    # Turbo inference tier for the image samplers: '' = off (normal
    # dtype policy), 'int8' = W8A8 conv tier on the MXU with scales
    # calibrated at sampler construction (ops/quant.py). Falls back to
    # the INFODIFF_TURBO env var when unset.
    turbo: str = ""
    # bf16 activations in the backbone (schedule math stays f32).
    bf16: bool = False
    # Data-parallel mesh size; None => all local devices.
    mesh_devices: Optional[int] = None
    # Multi-host (TPU pod) execution: initialize jax.distributed so every
    # process sees the global device set; the loader then feeds each host
    # only the global-batch rows its chips own (parallel/multihost.py).
    multihost: bool = False
    # Resume training from the latest checkpoint if present (new capability:
    # the reference saves weights only and cannot resume; run.py:145-158).
    resume: bool = False
    # FSDP/ZeRO: shard params + optimizer state over the data axis
    # (memory scaling for larger derivatives; math identical to DP).
    fsdp: bool = False
    # Tensor parallelism: size of the mesh's 'model' axis (1 = off).
    # Weights shard on their output-feature dim; composes with --fsdp.
    tp: int = 1
    # Pipeline parallelism: GPipe stages for train_latent_ddim (1 = off).
    # The LatentUNet's homogeneous middle stack partitions cleanly
    # (parallel/pp.py:make_pp_train_step).
    pp: int = 1
    # Sequence parallelism: ring-attention shards for the attention token
    # axis (1 = off). Engages when H*W at the attn level reaches
    # INFODIFF_SP_MIN_TOKENS (default 1024 — the 128px+ regime).
    sp: int = 1
    # Async checkpointing: Orbax snapshots device memory synchronously,
    # persists in the background — the train loop keeps stepping during
    # the write (barriered at train end / preemption).
    async_ckpt: bool = False
    # Checkpoint retention: keep only the newest N epochs (None = keep
    # all, like the reference).
    keep_checkpoints: Optional[int] = None
    # EMA of parameters (0 = off, like the reference; e.g. 0.9999).
    # When on, checkpoints carry ema_params and eval prefers them.
    ema_decay: float = 0.0
    # Architecture overrides (None -> the reference's hardcoded ch_mult
    # table and attn=[2]; models.py:619-622,743-746 / models.py:8).
    # Comma-separated ints, e.g. "1,2,2,2" / "1".
    ch_mult: Optional[str] = None
    attn: Optional[str] = None
    # Use the reference's quirky two-phase sampler semantics (its loop binds
    # t once, so phase 2's model runs the whole trajectory; sampling.py:199-203)
    # instead of the intended split-step behavior.
    two_phase_reference_quirk: bool = False
    # Use the reference's quirky reverse_sampling semantics: its wrapper
    # accepts `a` but never forwards it to the step generator
    # (sampling.py:84-87), so InfoDiff re-encodes the CURRENT noisy
    # sample at every reverse step instead of conditioning on the
    # original image's latent. Default = the intended semantics
    # (run.py:394 passes a explicitly).
    reverse_reference_quirk: bool = False

    def __post_init__(self):
        if self.model not in MODELS:
            raise ValueError(f"model must be one of {MODELS}, got {self.model!r}")
        if self.mode not in MODES:
            raise ValueError(f"mode must be one of {MODES}, got {self.mode!r}")
        if self.prior not in PRIORS:
            raise ValueError(f"prior must be one of {PRIORS}, got {self.prior!r}")
        if self.dataset not in DATASETS:
            raise ValueError(
                f"dataset must be one of {DATASETS}, got {self.dataset!r}"
            )
        from infodiffusion_tpu.ops.quant import MODES as _TURBO_MODES

        if self.turbo not in ("", "off") + _TURBO_MODES:
            raise ValueError(
                f"turbo must be '', 'off' or one of {_TURBO_MODES}, "
                f"got {self.turbo!r}"
            )

    def with_dataset_config(self) -> "Config":
        """Apply the per-dataset override table (reference: data.py:63-102)."""
        ch, unets_ch, enc_ch, size = DATASET_CONFIG[self.dataset]
        return dataclasses.replace(
            self,
            input_channels=ch,
            unets_channels=unets_ch,
            encoder_channels=enc_ch,
            input_size=size,
        )

    @property
    def shape(self) -> Tuple[int, int, int]:
        """Data shape in the reference's (C, H, W) convention
        (reference: data.py:100). Internally we compute in NHWC."""
        return (self.input_channels, self.input_size, self.input_size)

    @property
    def latent_shape(self) -> Tuple[int, int, int]:
        """Shape handed to the latent DDIM (reference: run.py:491)."""
        return (1, self.a_dim, self.a_dim)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def generate_exp_string(cfg: Config) -> str:
    """Experiment-naming contract (reference: utils.py:49-61).

    ``{dataset}_{a_dim}d[_{kld}kld[_{C}C]][_{mmd}mmd][_{prior}][_bottleneck]``

    Float formatting follows Python's default str() like the reference's
    f-strings, so checkpoints/artifacts interop by name.
    """
    root = f"{cfg.dataset}_{cfg.a_dim}d"
    if cfg.kld_weight != 0:
        root += f"_{cfg.kld_weight}kld"
        if cfg.use_C:
            root += f"_{cfg.C_max}C"
    if cfg.mmd_weight != 0:
        root += f"_{cfg.mmd_weight}mmd"
    if cfg.prior != "regular":
        root += f"_{cfg.prior}"
    if cfg.is_bottleneck:
        root += "_bottleneck"
    return root
