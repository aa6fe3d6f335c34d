"""CLI with flag-for-flag parity with the reference (run.py:25-97).

Same flag names, defaults, required markers and choices, so the nine
reference shell workflows run unchanged against this entry point. Extra
TPU-native flags are added at the end (sampling_steps, bf16,
mesh_devices, resume) — all optional, all defaulting to reference
behavior.
"""

from __future__ import annotations

import argparse
from typing import Optional, Sequence

from infodiffusion_tpu.config import Config, DATASETS, MODELS, MODES, PRIORS


def build_parser(require_mode: bool = True) -> argparse.ArgumentParser:
    """``require_mode=False`` serves eval_disentanglement.py: the
    reference's eval_disentangle.sh omits --mode though its argparse
    requires it (another broken-as-shipped script)."""
    p = argparse.ArgumentParser()
    p.add_argument("--r_seed", type=int, default=0,
                   help="the value of given random seed")
    p.add_argument("--img_id", type=int, default=0,
                   help="the id of given img")
    p.add_argument("--model", required=True, choices=list(MODELS),
                   help="which type of model to run")
    p.add_argument("--mode", required=require_mode, choices=list(MODES),
                   default="save_latent" if not require_mode else None,
                   help="which mode to run")
    p.add_argument("--prior", required=True, choices=list(PRIORS),
                   help="which type of prior to run")
    p.add_argument("--kld_weight", type=float, default=0,
                   help="weight of kld loss")
    p.add_argument("--mmd_weight", type=float, default=0.1,
                   help="weight of mmd loss")
    p.add_argument("--use_C", action="store_true", default=False,
                   help="use control constant or not")
    p.add_argument("--C_max", type=float, default=25,
                   help="control constant of kld loss")
    p.add_argument("--dataset", required=True, choices=list(DATASETS),
                   help="training dataset")
    p.add_argument("--img_folder", default="./imgs",
                   help="path to save sampled images")
    p.add_argument("--log_folder", default="./logs",
                   help="path to save logs")
    p.add_argument("-e", "--epochs", type=int, default=20,
                   help="number of epochs to train")
    p.add_argument("--save_epochs", type=int, default=5,
                   help="number of epochs to save model")
    p.add_argument("--batch_size", type=int, default=64,
                   help="training batch size")
    p.add_argument("--learning_rate", type=float, default=0.0001,
                   help="learning rate")
    p.add_argument("--optimizer", default="adam", choices=["adam"],
                   help="optimization algorithm")
    p.add_argument("--model_folder", default="./models",
                   help="folder where checkpoints are stored")
    p.add_argument("--deterministic", action="store_true", default=False,
                   help="deterministic sampling")
    p.add_argument("--input_channels", type=int, default=1)
    p.add_argument("--unets_channels", type=int, default=64)
    p.add_argument("--encoder_channels", type=int, default=64)
    p.add_argument("--input_size", type=int, default=32,
                   help="expected size of input")
    p.add_argument("--a_dim", type=int, default=32, required=True,
                   help="dimensionality of auxiliary variable")
    p.add_argument("--beta1", type=float, default=1e-5)
    p.add_argument("--betaT", type=float, default=1e-2)
    p.add_argument("--diffusion_steps", type=int, default=1000)
    p.add_argument("--split_step", type=int, default=500,
                   help="the step for splitting two phases")
    p.add_argument("--sampling_number", type=int, default=16,
                   help="number of sampled images")
    p.add_argument("--data_dir", type=str, default="./data")
    p.add_argument("--tb_logger", action="store_true",
                   help="use tensorboard logger.")
    p.add_argument("--is_latent", action="store_true",
                   help="use latent diffusion for unconditional sampling.")
    p.add_argument("--is_bottleneck", action="store_true",
                   help="only fuse aux variable in bottleneck layers.")
    # script-compat flags: the reference's eval_fid.sh / save_latent.sh pass
    # --disent_metric and --save_epoch, which the reference's own argparse
    # does NOT define (its scripts crash as shipped). Accepted here so the
    # canonical workflows run unchanged.
    p.add_argument("--disent_metric", choices=["tad", "dci"], default="tad",
                   help="(script compat; forwarded to eval_disentanglement)")
    p.add_argument("--save_epoch", type=int, dest="save_epochs",
                   default=argparse.SUPPRESS, help=argparse.SUPPRESS)
    # --- TPU-native extensions (no reference counterpart) ---
    p.add_argument("--sampling_steps", type=int, default=None,
                   help="DDIM-N fast sampling (default: full T grid like "
                        "the reference)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 activations (schedule math stays f32)")
    p.add_argument("--mesh_devices", type=int, default=None,
                   help="data-parallel mesh size (default: all devices)")
    p.add_argument("--multihost", action="store_true",
                   help="initialize the JAX distributed runtime (TPU pods: "
                        "one process per host; also auto-detected from the "
                        "coordinator env vars)")
    p.add_argument("--resume", action="store_true",
                   help="resume training from the latest checkpoint")
    p.add_argument("--fsdp", action="store_true",
                   help="shard params+optimizer state over the data axis "
                        "(ZeRO-style memory scaling)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel size (the mesh's 'model' axis; "
                        "weights shard on output features, composes with "
                        "--fsdp)")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel stages for train_latent_ddim "
                        "(GPipe over a 'stage' mesh axis; the LatentUNet's "
                        "8 homogeneous middle layers partition cleanly)")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel size for attention: shard the "
                        "H*W token axis over a 'seq' mesh axis (ring "
                        "attention) when the token count is large enough "
                        "(INFODIFF_SP_MIN_TOKENS, default 1024)")
    from infodiffusion_tpu.ops.quant import MODES as _TURBO_MODES

    p.add_argument("--turbo", choices=["", "off", *_TURBO_MODES],
                   default="",
                   help="inference turbo tier for the image samplers: "
                        "'int8' runs the UNet conv bodies W8A8 on the MXU "
                        "with scales calibrated at sampler construction "
                        "(ops/quant.py); schedule math, norms and the "
                        "head/tail convs stay on the normal policy. "
                        "'int8x' additionally reads the residual stream "
                        "through per-block s8 copies — measured SLOWER "
                        "than int8 on v5e (s8 elementwise passes run at "
                        "~half VPU bandwidth), kept as a documented "
                        "negative result. "
                        "'' falls through to $INFODIFF_TURBO; 'off' "
                        "forces it off even when the env var is set")
    p.add_argument("--async_ckpt", action="store_true",
                   help="non-blocking checkpoint writes (Orbax async; "
                        "barriered at train end / preemption)")
    p.add_argument("--keep_checkpoints", type=int, default=None,
                   help="retain only the newest N checkpoint epochs")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="EMA decay for eval weights (0 = off)")
    p.add_argument("--ch_mult", type=str, default=None,
                   help="override UNet ch_mult, e.g. '1,2,2,2'")
    p.add_argument("--attn", type=str, default=None,
                   help="override attention level indices, e.g. '2'")
    p.add_argument("--two_phase_reference_quirk", action="store_true",
                   help="reproduce the reference two-phase sampler's "
                        "dead-branch bug (sampling.py:199-203)")
    p.add_argument("--reverse_reference_quirk", action="store_true",
                   help="reproduce the reference reverse_sampling bug "
                        "that drops `a` and re-encodes the noisy sample "
                        "each step (sampling.py:84-87)")
    return p


def parse_args(argv: Optional[Sequence[str]] = None) -> Config:
    args = build_parser().parse_args(argv)
    return Config(**vars(args))


def dispatch(cfg: Config):
    from infodiffusion_tpu import runner

    if cfg.mode == "train":
        return runner.train(cfg)
    if cfg.mode == "train_latent_ddim":
        return runner.train(cfg, latent=True)
    if cfg.mode == "save_original_img":
        return runner.save_original_img(cfg)
    # batch-size overrides (reference: run.py:535-538)
    if cfg.mode in ("disentangle", "latent_quality"):
        cfg = cfg.replace(batch_size=1)
    elif cfg.mode == "interpolate":
        cfg = cfg.replace(batch_size=2)
    return runner.evaluate(cfg)


def main(argv: Optional[Sequence[str]] = None):
    from infodiffusion_tpu.cache import (
        enable_compilation_cache,
        force_cpu_if_requested,
    )

    force_cpu_if_requested()
    enable_compilation_cache()
    cfg = parse_args(argv)
    from infodiffusion_tpu.parallel.multihost import maybe_initialize

    maybe_initialize(cfg.multihost)
    dispatch(cfg)


if __name__ == "__main__":
    main()
