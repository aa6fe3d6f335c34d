#!/usr/bin/env python
"""Input-pipeline scale rehearsal: prove host JPEG decode keeps up with
the device encoder at CelebA scale (reference workflow: run.py:415-443
save_latent over ~200k JPEGs; loader semantics: data.py:149-186).

Real CelebA is unavailable on this machine (zero egress), so stage 1
synthesizes a CelebA-shaped corpus: N JPEGs at the native 178x218
geometry with photo-like content (smooth gradients + structured
rectangles -> realistic JPEG entropy, ~6-10 KB/file like the real
align_celeba files). Stage 2 drives the REAL product path over it —
``ImageFolderDataset`` (native C++ batcher, D2C crop + resize-64) under
the prefetching ``DataLoader`` — and measures:

  - host decode throughput (imgs/s) through the native loader, and the
    PIL fallback rate on a slice for comparison;
  - end-to-end save_latent throughput with the flagship Encoder jitted
    on the default backend (decode overlapped with device compute);
  - the per-core scaling verdict: cores needed so that host decode
    outruns the measured device encode rate (bench.py encode mode).

This host has ONE core (nproc=1), so the decode numbers here are
per-core; real TPU-VM hosts have far more (v5e-8 hosts: 112 vCPUs) and
the native loader's thread pool scales per-file. The JSON verdict makes
that arithmetic explicit rather than hiding it.

Usage:
  python tools/pipeline_rehearsal.py --n 200000 [--dir DIR]
      [--encode-limit 20000] [--decode-limit 50000] [--skip-e2e]

Resumable: generation skips files that already exist.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def generate_corpus(root: str, n: int, seed: int = 0) -> list:
    """Synthesize a CelebA-geometry JPEG corpus (178x218, quality 85).

    Content is structured (gradient background + face-ish blobs +
    rectangles) so files land in the real corpus' size range instead of
    the degenerate flat-color few-hundred-byte regime."""
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    W, H = 178, 218
    rng = np.random.RandomState(seed)
    # a bank of 256 base canvases; per-file cheap variation keeps
    # generation ~encode-bound on this 1-core host
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    bases = []
    for _ in range(256):
        g = (
            rng.rand() * xx / W + rng.rand() * yy / H
            + 0.3 * np.sin(xx / rng.uniform(8, 40))
            * np.cos(yy / rng.uniform(8, 40))
        )
        img = np.stack([g * rng.uniform(0.5, 1.0) for _ in range(3)], -1)
        img = (img - img.min()) / max(float(np.ptp(img)), 1e-6)
        # photo-like high-frequency texture -> realistic JPEG entropy
        # (without it files land ~4 KB; real align_celeba is ~8 KB)
        img = img * 200 + 20 + rng.randn(H, W, 3) * 6
        bases.append(np.clip(img, 0, 255).astype(np.uint8))
    paths = []
    t0 = time.perf_counter()
    made = 0
    for i in range(n):
        p = os.path.join(root, f"{i:06d}.jpg")
        paths.append(p)
        if os.path.exists(p):
            continue
        arr = bases[i % 256].copy()
        r = np.random.RandomState(seed * 1000003 + i)
        for _ in range(4):  # face-ish rectangles around the D2C window
            x0 = r.randint(30, 120)
            y0 = r.randint(60, 160)
            w, h = r.randint(12, 50), r.randint(12, 50)
            arr[y0 : y0 + h, x0 : x0 + w] = r.randint(0, 255, size=3)
        Image.fromarray(arr).save(p, quality=85)
        made += 1
        if made % 20000 == 0:
            rate = made / (time.perf_counter() - t0)
            print(f"  generated {made} ({rate:.0f} files/s)", flush=True)
    if made:
        print(f"  generated {made} new files in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
    return paths


def measure_decode(paths, limit: int, batch: int = 256) -> dict:
    """Native-loader decode throughput through the product dataset path
    (D2C crop + resize 64, the CelebA save_latent transform)."""
    from infodiffusion_tpu.data.datasets import ImageFolderDataset
    from infodiffusion_tpu.data.native import native_available

    ds = ImageFolderDataset(paths, size=64, d2c=True)
    n = min(limit, len(paths)) // batch * batch
    # warm the file cache + native handle
    ds.get_batch(np.arange(batch))
    t0 = time.perf_counter()
    for b in range(n // batch):
        ds.get_batch(np.arange(b * batch, (b + 1) * batch))
    native_rate = n / (time.perf_counter() - t0)

    # PIL fallback on a small slice, for the comparison row
    os.environ["INFODIFF_DISABLE_NATIVE"] = "1"
    try:
        import infodiffusion_tpu.data.native as nat

        nat._LIB, nat._LIB_FAILED = None, False
        ds2 = ImageFolderDataset(paths, size=64, d2c=True)
        m = min(512, n)
        t0 = time.perf_counter()
        ds2.get_batch(np.arange(m))
        pil_rate = m / (time.perf_counter() - t0)
    finally:
        del os.environ["INFODIFF_DISABLE_NATIVE"]
        nat._LIB, nat._LIB_FAILED = None, False
    return {
        "native_available": native_available(),
        "decode_imgs": n,
        "native_decode_imgs_per_sec_per_core": round(native_rate, 1),
        "pil_decode_imgs_per_sec_per_core": round(pil_rate, 1),
    }


def measure_e2e(paths, limit: int, batch: int = 256) -> dict:
    """save_latent end-to-end: prefetching DataLoader (native decode on
    the producer thread) feeding the jitted flagship Encoder."""
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from infodiffusion_tpu.cache import enable_compilation_cache
    from infodiffusion_tpu.data.datasets import ImageFolderDataset
    from infodiffusion_tpu.data.loader import DataLoader
    from infodiffusion_tpu.models import InfoDiff

    enable_compilation_cache()
    model = InfoDiff(
        T=1000, a_dim=256, shape=(3, 64, 64), unets_channels=64,
        encoder_channels=64, mmd_weight=0.1, epochs=50,
        dtype=jnp.bfloat16,
    )
    x0 = jnp.zeros((1, 64, 64, 3))
    rngs = {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
            "reparam": jr.PRNGKey(2), "dropout": jr.PRNGKey(3)}
    variables = jax.jit(
        lambda: model.init(rngs, x0, 0, method=type(model).loss_fn)
    )()

    @jax.jit
    def enc(variables, x):
        a, _aq, _mu, _lv = model.apply(
            variables, x, method=type(model).encode, sample=False
        )
        return a

    n = min(limit, len(paths)) // batch * batch
    ds = ImageFolderDataset(paths[:n], size=64, d2c=True)
    loader = DataLoader(ds, batch, shuffle=False, prefetch=4)
    # compile outside the timed loop
    np.asarray(enc(variables, jnp.zeros((batch, 64, 64, 3))))
    t0 = time.perf_counter()
    total = 0
    out = None
    for x in loader:
        out = enc(variables, x)
        total += batch
    np.asarray(out)  # drain the device queue
    rate = total / (time.perf_counter() - t0)
    return {
        "e2e_imgs": total,
        "save_latent_e2e_imgs_per_sec": round(rate, 1),
        "backend": jax.default_backend(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--dir", default="/tmp/infodiff_rehearsal_jpegs")
    ap.add_argument("--decode-limit", type=int, default=50_000)
    ap.add_argument("--encode-limit", type=int, default=20_000)
    ap.add_argument("--encode-rate", type=float, default=4610.8,
                    help="measured device encode rate (bench.py encode)")
    ap.add_argument("--skip-e2e", action="store_true")
    args = ap.parse_args()

    print(f"[1/3] corpus: {args.n} JPEGs at {args.dir}", flush=True)
    paths = generate_corpus(args.dir, args.n)
    sizes = [os.path.getsize(p) for p in paths[:2000]]
    print(f"  mean file size {np.mean(sizes) / 1024:.1f} KB", flush=True)

    if args.decode_limit > 0:
        print("[2/3] native decode throughput", flush=True)
        dec = measure_decode(paths, args.decode_limit)
        print(json.dumps(dec), flush=True)
    else:  # --decode-limit 0: skip the decode stage (None, not NaN —
        # json.dumps emits bare NaN, which is not legal JSON)
        dec = {"native_decode_imgs_per_sec_per_core": None}

    e2e = {}
    if not args.skip_e2e:
        print("[3/3] save_latent end-to-end (decode || device encode)",
              flush=True)
        e2e = measure_e2e(paths, args.encode_limit)
        print(json.dumps(e2e), flush=True)

    per_core = dec["native_decode_imgs_per_sec_per_core"]
    cores_needed = (
        round(args.encode_rate / max(per_core, 1e-9), 1)
        if per_core is not None else None
    )
    verdict = {
        "corpus_files": len(paths),
        "mean_jpeg_kb": round(float(np.mean(sizes)) / 1024, 1),
        "host_cores": os.cpu_count(),
        "native_decode_imgs_per_sec_per_core": per_core,
        "device_encode_imgs_per_sec": args.encode_rate,
        "cores_for_compute_bound": cores_needed,
        **e2e,
    }
    print("VERDICT " + json.dumps(verdict), flush=True)


if __name__ == "__main__":
    main()
