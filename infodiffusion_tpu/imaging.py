"""PNG grid/image writing (torchvision.utils.save_image equivalent).

The reference saves sample grids with ``save_image(..., normalize=True,
range=(-1, 1), nrow=k)`` (run.py:103-143) and single FID PNGs pre-scaled
to [0,1] (run.py:289-295). Implemented on PIL + numpy; images are NHWC.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def _normalize01(img: np.ndarray, normalize: bool, value_range) -> np.ndarray:
    img = np.asarray(img, dtype=np.float32)
    if normalize:
        lo, hi = value_range if value_range else (img.min(), img.max())
        img = (img - lo) / max(hi - lo, 1e-12)
    return np.clip(img, 0.0, 1.0)


def _to_uint8(img01: np.ndarray) -> np.ndarray:
    return (img01 * 255.0 + 0.5).astype(np.uint8)


def make_grid(
    batch: np.ndarray,
    nrow: int = 8,
    padding: int = 2,
    pad_value: float = 0.0,
) -> np.ndarray:
    """[N, H, W, C] -> grid [H', W', C] (torchvision layout: nrow images
    per row, 2px padding)."""
    n, h, w, c = batch.shape
    if n == 0:
        raise ValueError("make_grid: empty batch")
    ncol = min(nrow, n)
    nrows = (n + ncol - 1) // ncol
    gh = nrows * (h + padding) + padding
    gw = ncol * (w + padding) + padding
    grid = np.full((gh, gw, c), pad_value, dtype=batch.dtype)
    for i in range(n):
        r, col = divmod(i, ncol)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[y : y + h, x : x + w] = batch[i]
    return grid


def save_image(
    img: np.ndarray,
    path: str,
    *,
    nrow: int = 8,
    normalize: bool = False,
    value_range: Optional[Tuple[float, float]] = None,
):
    """Save [N,H,W,C] as a grid PNG, or [H,W,C]/[H,W] as a single PNG."""
    from PIL import Image

    img = np.asarray(img)
    if img.ndim == 4:
        # torchvision order: normalize the IMAGES first, then assemble —
        # pad_value lands in OUTPUT space (black borders with the
        # reference's normalize=True range=(-1,1) call), and min/max
        # normalization never includes the padding
        img = make_grid(_normalize01(img, normalize, value_range),
                        nrow=nrow)
        u8 = _to_uint8(img)
    else:
        u8 = _to_uint8(_normalize01(img, normalize, value_range))
    if u8.ndim == 3 and u8.shape[-1] == 1:
        u8 = u8[..., 0]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(u8).save(path)
