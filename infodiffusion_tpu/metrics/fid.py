"""FID / KID pipeline (reference: gen_fid_stats.py, calc_fid.py via
clean-fid).

Same three-stage contract as the reference: (1) make_custom_stats over a
real-image dump -> cached stats, (2) generate images, (3) compute_fid /
compute_kid of a folder against the named stats. The statistics math
(Frechet distance over feature mean/cov; KID's unbiased polynomial-kernel
MMD over subsets) matches clean-fid's definitions.

Feature extractors are pluggable because this environment has no network
egress and no bundled InceptionV3 weights:

- ``inception`` (preferred): the TPU-native JAX InceptionV3 in
  metrics/inception.py, jitted end-to-end, activated whenever a local
  ``pt_inception`` checkpoint is found (INFODIFF_INCEPTION_WEIGHTS or
  the torch-hub cache) — exact parity with pytorch-fid's extractor
  under clean-fid's antialiased resize (near-parity with clean-fid's
  TF-torchscript port; PARITY.md D8); falls back to the clean-fid torch
  extractor when only that is importable.
- ``random`` (fallback): a fixed seeded random-conv feature network in
  JAX, jitted and batched on TPU. Random-projection features preserve
  distributional distances in expectation (Johnson-Lindenstrauss-style),
  so scores are *internally comparable* across runs of this framework,
  but are NOT comparable to published Inception-FID numbers — every
  output is labeled with the extractor used.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

def stats_dir() -> str:
    """Resolved per call so INFODIFF_FID_STATS_DIR set after import (or
    monkeypatched in tests) is honored."""
    return os.environ.get("INFODIFF_FID_STATS_DIR", "./fid_stats")


# ---------------------------------------------------------------------------
# feature extractors
# ---------------------------------------------------------------------------


def _try_inception_extractor():
    try:
        import torch
        from cleanfid.features import build_feature_extractor  # type: ignore

        # build on the device we actually feed (clean-fid defaults to
        # cuda, which either crashes on construction here or mismatches
        # the CPU tensors extract() passes in)
        device = torch.device("cuda" if torch.cuda.is_available() else "cpu")
        model = build_feature_extractor(mode="clean", device=device)

        def extract(batch_u8):  # [B, H, W, 3] uint8
            # clean-mode extractors expect PRE-resized 299x299 float
            # 0..255 input (resize_inside=False asserts the size) — the
            # antialiased resize is ours to do, same clean_resize the
            # JAX extractor uses
            from infodiffusion_tpu.metrics.inception import clean_resize

            x = clean_resize(batch_u8) * 255.0
            x = torch.from_numpy(x.transpose(0, 3, 1, 2)).float()
            with torch.no_grad():
                return model(x.to(device)).cpu().numpy()

        return extract, "inception-clean"
    except ImportError:
        return None
    except Exception as e:  # importable but unusable (e.g. weight
        # download blocked): say so instead of silently degrading
        import warnings

        warnings.warn(
            f"clean-fid extractor unavailable ({type(e).__name__}: {e}); "
            "falling back"
        )
        return None


def _random_conv_extractor(seed: int = 0):
    """Seeded 4-layer random conv net -> global avg+max pooled features,
    jitted once; runs on the TPU for large folders."""
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    key = jr.PRNGKey(seed)
    ks = jr.split(key, 4)
    chans = [(3, 64), (64, 128), (128, 192), (192, 384)]
    kernels = [
        jr.normal(k, (3, 3, ci, co)) * np.sqrt(2.0 / (9 * ci))
        for k, (ci, co) in zip(ks, chans)
    ]

    @jax.jit
    def features(x):  # [B, H, W, 3] float in [0, 1]
        h = x * 2.0 - 1.0
        for w in kernels:
            h = jax.lax.conv_general_dilated(
                h, w, window_strides=(2, 2), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            h = jax.nn.leaky_relu(h, 0.2)
        avg = jnp.mean(h, axis=(1, 2))
        mx = jnp.max(h, axis=(1, 2))
        return jnp.concatenate([avg, mx], axis=-1)  # [B, 768]

    def extract(batch_u8):
        x = jnp.asarray(batch_u8, jnp.float32) / 255.0
        return np.asarray(features(x))

    return extract, "random-conv-v1"


def get_extractor(name: str = "auto"):
    if name in ("auto", "inception"):
        from infodiffusion_tpu.metrics.inception import jax_inception_extractor

        got = jax_inception_extractor() or _try_inception_extractor()
        if got is not None:
            return got
        if name == "inception":
            raise RuntimeError(
                "InceptionV3 weights unavailable: no local pt_inception "
                "checkpoint (set INFODIFF_INCEPTION_WEIGHTS) and clean-fid "
                "is not importable; use extractor='random' or provide "
                "weights (no network egress in this environment)"
            )
    elif name != "random":
        raise ValueError(
            f"unknown extractor {name!r} (expected 'auto', 'inception' or "
            "'random') — refusing to silently hand back random-conv "
            "features, whose scores are not Inception-comparable"
        )
    return _random_conv_extractor()


# ---------------------------------------------------------------------------
# folder -> features
# ---------------------------------------------------------------------------


def _iter_folder(folder: str, res: Optional[int], batch: int = 256):
    """Batches of [B, H, W, 3] uint8. ``res=None`` keeps images at their
    NATIVE size (flushing the buffer whenever the size changes) — the
    clean-fid semantics, where the extractor's own antialiased 299
    resize is the ONLY resample. An integer ``res`` pre-resizes with
    quantized uint8 bicubic (needed for extractors without an internal
    resize, whose inputs must share one resolution to be comparable)."""
    from PIL import Image

    from infodiffusion_tpu.data.datasets import _list_images

    files = _list_images(folder)
    if not files:
        raise FileNotFoundError(f"no images under {folder}")
    buf = []
    for p in files:
        img = Image.open(p).convert("RGB")
        if res is not None:
            img = img.resize((res, res), Image.BICUBIC)
        arr = np.asarray(img, np.uint8)
        if buf and buf[-1].shape != arr.shape:
            yield np.stack(buf)
            buf = []
        buf.append(arr)
        if len(buf) == batch:
            yield np.stack(buf)
            buf = []
    if buf:
        yield np.stack(buf)


def folder_features(
    folder: str, res: int = 64, extractor: str = "auto",
    max_images: Optional[int] = None,
) -> Tuple[np.ndarray, str]:
    extract, tag = get_extractor(extractor)
    # inception extractors clean-resize to 299 internally: feed native
    # sizes so that resize is the only resample, exactly like clean-fid
    # feeds original images (an extra res x res uint8 bicubic first
    # would shift scores off published numbers). The random-conv
    # extractor has no internal resize — it keeps the res normalization
    # so real and generated folders are extracted at one resolution.
    size = None if tag.startswith("inception") else res
    feats = []
    n = 0
    for batch in _iter_folder(folder, size):
        feats.append(extract(batch))
        n += len(batch)
        if max_images is not None and n >= max_images:
            break
    out = np.concatenate(feats)
    if max_images is not None:
        out = out[:max_images]
    return out, tag


# ---------------------------------------------------------------------------
# statistics
# ---------------------------------------------------------------------------


def feature_stats(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID = |mu1-mu2|^2 + Tr(S1 + S2 - 2 (S1 S2)^{1/2}).

    Near-singular covariances (fewer images than feature dims) can make
    sqrtm non-finite; like pytorch-fid/clean-fid, retry with an eps
    offset on the diagonals instead of returning NaN."""
    import scipy.linalg

    diff = mu1 - mu2
    covmean = scipy.linalg.sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm(
            (sigma1 + offset) @ (sigma2 + offset)
        )
    if np.iscomplexobj(covmean):
        # like pytorch-fid: a large imaginary component means sqrtm
        # genuinely failed — refuse to return a silently-wrong score
        imax = float(np.max(np.abs(covmean.imag)))
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(
                f"covariance sqrtm failed (max imaginary component "
                f"{imax:.3g}): too few images for the feature "
                "dimensionality to form usable FID statistics"
            )
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1 + sigma2 - 2.0 * covmean))


def kid_score(
    feats1: np.ndarray, feats2: np.ndarray,
    n_subsets: int = 100, max_subset_size: int = 1000, seed: int = 0,
) -> float:
    """Unbiased polynomial-kernel MMD averaged over random subsets
    (clean-fid's KID protocol)."""
    n = feats1.shape[1]
    m = min(min(feats1.shape[0], feats2.shape[0]), max_subset_size)
    rng = np.random.RandomState(seed)
    t = 0.0
    for _ in range(n_subsets):
        x = feats2[rng.choice(feats2.shape[0], m, replace=False)]
        y = feats1[rng.choice(feats1.shape[0], m, replace=False)]
        a = (x @ x.T / n + 1) ** 3 + (y @ y.T / n + 1) ** 3
        b = (x @ y.T / n + 1) ** 3
        t += (a.sum() - np.trace(a)) / (m - 1) - b.sum() * 2 / m
    return float(t / n_subsets / m)


# ---------------------------------------------------------------------------
# clean-fid-shaped public API (reference: gen_fid_stats.py:8, calc_fid.py:6-14)
# ---------------------------------------------------------------------------


def _stats_path(name: str, extractor_tag: str) -> str:
    d = stats_dir()
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"{name}_{extractor_tag}.npz")


def make_custom_stats(
    name: str, folder: str, res: int = 64, extractor: str = "auto"
) -> str:
    feats, tag = folder_features(folder, res, extractor)
    mu, sigma = feature_stats(feats)
    path = _stats_path(name, tag)
    np.savez(path, mu=mu, sigma=sigma, feats=feats, extractor=tag, res=res)
    return path


def compute_fid(
    folder: str, dataset_name: str, dataset_res: int = 64,
    num_gen: int = 10000, extractor: str = "auto", **_ignored,
) -> float:
    feats, tag = folder_features(
        folder, dataset_res, extractor, max_images=num_gen
    )
    ref = np.load(_stats_path(dataset_name, tag), allow_pickle=True)
    mu, sigma = feature_stats(feats)
    return frechet_distance(ref["mu"], ref["sigma"], mu, sigma)


def compute_kid(
    folder: str, dataset_name: str, dataset_res: int = 64,
    num_gen: int = 10000, extractor: str = "auto", **_ignored,
) -> float:
    feats, tag = folder_features(
        folder, dataset_res, extractor, max_images=num_gen
    )
    ref = np.load(_stats_path(dataset_name, tag), allow_pickle=True)
    return kid_score(ref["feats"], feats)
