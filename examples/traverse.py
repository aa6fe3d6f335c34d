#!/usr/bin/env python
"""Latent traversal of real images via the library API: encode, then
sweep one latent dimension and decode each variant (the `disentangle`
CLI mode, programmatically).

    python examples/traverse.py --model diff --mode eval --prior regular \
        --dataset celeba --a_dim 256 --epochs 50 --mmd_weight 0.1 \
        --deterministic --img_id 0

Writes traverse-dim{K}.png rows for the first few latent dims.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



import numpy as np

from infodiffusion_tpu.cli import parse_args
from infodiffusion_tpu.data import get_dataset, DataLoader
from infodiffusion_tpu.imaging import save_image
from infodiffusion_tpu.pipelines import InfoDiffusionPipeline


def main(argv=None, n_dims: int = 4):
    # apply the per-dataset config table (channels/size) BEFORE building
    # the dataset — the raw parsed cfg still has the argparse defaults
    cfg = parse_args(argv).with_dataset_config()
    pipe = InfoDiffusionPipeline.from_checkpoint(cfg)
    ds = get_dataset(cfg)
    loader = iter(DataLoader(ds, batch_size=1, shuffle=False))
    # honor --img_id like the disentangle CLI mode (runner._nth_batch)
    for _ in range(cfg.img_id):
        next(loader)
    x = np.asarray(next(loader))
    for k in range(min(n_dims, cfg.a_dim)):
        row = np.asarray(pipe.traverse(x, dim=k))
        save_image(row, f"traverse-dim{k}.png", nrow=row.shape[0],
                   normalize=True, value_range=(-1.0, 1.0))
        print(f"wrote traverse-dim{k}.png")


if __name__ == "__main__":
    main(sys.argv[1:])
