#!/usr/bin/env python
"""Generate a grid of samples from a trained checkpoint via the library
API (no CLI modes involved).

    python examples/generate.py --model diff --mode eval --prior regular \
        --dataset celeba --a_dim 256 --epochs 50 --mmd_weight 0.1 \
        --deterministic --sampling_steps 100 --sampling_number 64

Flags are the standard CLI surface (cli.parse_args); the checkpoint is
resolved exactly like `--mode eval` would (model-{epochs} under
--model_folder). Writes generated.png to the CWD.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



import numpy as np

from infodiffusion_tpu.cli import parse_args
from infodiffusion_tpu.imaging import save_image
from infodiffusion_tpu.pipelines import InfoDiffusionPipeline


def main(argv=None):
    cfg = parse_args(argv)
    pipe = InfoDiffusionPipeline.from_checkpoint(cfg)
    imgs = np.asarray(
        pipe.generate(cfg.sampling_number, steps=cfg.sampling_steps)
    )
    save_image(imgs, "generated.png", normalize=True,
               value_range=(-1.0, 1.0))
    print(f"wrote generated.png ({imgs.shape[0]} samples)")


if __name__ == "__main__":
    main(sys.argv[1:])
