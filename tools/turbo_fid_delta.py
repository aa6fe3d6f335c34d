#!/usr/bin/env python
"""Metric-level turbo parity: the FID delta between the bf16 parity
tier and the int8 turbo tier on the SAME trained model (round-3 VERDICT
item 3 / weak #4).

The int8 tier's parity claim (PARITY.md D16) rested on pixel-level
evidence from one model's grids (94% exact, max diff 1/255). Its
purpose, though, is FID-grade generation (`/root/reference/
calc_fid.py:6-14` is the metric contract) — a systematic quantization
bias that FID *would* see was invisible to the suite. This tool runs
the existing synthetic-celeba generative pipeline end to end through
the REAL CLI (the same 4-step flow as .claude/skills/verify, at
flagship size) and scores BOTH tiers with the same extractor:

  1. train the flagship-size InfoDiff on factor-rendered celeba
  2. save_latent -> train_latent_ddim (the latent prior)
  3. eval_fid --is_latent twice: INFODIFF_TURBO="" and "int8"
     (identical seeds -> identical xT/latent draws; only the conv
     tier differs)
  4. FID-score both sample sets against held-out rendered images, plus
     the real-vs-real floor (disjoint halves of the rendered set)

Prints ONE JSON line:
  {"fid_bf16": .., "fid_int8": .., "delta": .., "real_floor": ..,
   "verdict": "fid_invariant" | "fid_divergent"}

The extractor is the labeled random-conv fallback (no Inception
weights on this machine — PARITY.md D8); scores are only internally
comparable, which is exactly what a tier DELTA needs. With a real
weights file (INFODIFF_INCEPTION_WEIGHTS) the same tool produces
true-Inception deltas.

Env knobs: INFODIFF_TFD_DIR (workdir; default mktemp),
INFODIFF_TFD_EPOCHS (default 300), INFODIFF_TFD_LATENT_EPOCHS (300),
INFODIFF_TFD_SAMPLES (2048), INFODIFF_TFD_REAL_N (4096),
INFODIFF_TFD_SKIP_TRAIN=1 (reuse the workdir's checkpoints).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def tier_verdict(delta, fid_bf16, floor):
    """Invariance rule: the tier delta must sit within a few percent of
    the bf16 score AND not orders above the real-vs-real floor. The
    floor of a labeled-fallback FID is ~0, so the relative bound is the
    operative one; with true Inception weights the 10x-floor bound
    engages too."""
    noise = max(abs(floor), 1e-6)
    return (
        "fid_invariant"
        if delta <= max(0.03 * fid_bf16, 10.0 * noise)
        else "fid_divergent"
    )


def sh(args, env=None, cwd=None):
    e = dict(os.environ)
    e.update(env or {})
    print("+ " + " ".join(args), flush=True)
    subprocess.run(args, env=e, cwd=cwd, check=True)


def dump_real_halves(work: str, n: int, size: int):
    """Render 2n synthetic-celeba images (the SAME factor distribution
    the model trained on, disjoint draws) into two PNG folders."""
    import numpy as np

    from infodiffusion_tpu.data.datasets import _render_celeba
    from infodiffusion_tpu.imaging import save_image  # noqa: F401 (PIL path)
    from PIL import Image

    rng = np.random.RandomState(1234)  # != the training seed (0)
    ds = _render_celeba(2 * n, size, rng)
    dirs = [os.path.join(work, d) for d in ("real_a", "real_b")]
    for d in dirs:
        os.makedirs(d, exist_ok=True)
    for i, img in enumerate(ds.images):
        d = dirs[0] if i < n else dirs[1]
        Image.fromarray(img).save(
            os.path.join(d, f"real-{i:06d}.png")
        )
    return dirs


def main():
    # the tool scores FID in-process (not just via run.py subprocesses),
    # so honor the CLI's CPU-forcing knob here too (tunnel-down runs)
    from infodiffusion_tpu.cache import force_cpu_if_requested

    force_cpu_if_requested()
    work = os.environ.get("INFODIFF_TFD_DIR") or tempfile.mkdtemp(
        prefix="turbo_fid_"
    )
    os.makedirs(work, exist_ok=True)
    os.chdir(work)
    print(f"workdir: {work}")

    epochs = os.environ.get("INFODIFF_TFD_EPOCHS", "300")
    lat_epochs = os.environ.get("INFODIFF_TFD_LATENT_EPOCHS", "300")
    n_samples = int(os.environ.get("INFODIFF_TFD_SAMPLES", "2048"))
    real_n = int(os.environ.get("INFODIFF_TFD_REAL_N", "4096"))
    size = 64

    py = sys.executable
    run = os.path.join(REPO, "run.py")
    common = [
        "--model", "diff", "--prior", "regular", "--dataset", "celeba",
        "--a_dim", "32", "--data_dir", "synthetic",
        "--diffusion_steps", "1000", "--batch_size", "128",
        "--r_seed", "64", "--mmd_weight", "0.1", "--bf16",
    ]
    base_env = {"INFODIFF_SYNTHETIC_N": "2048"}

    if os.environ.get("INFODIFF_TFD_SKIP_TRAIN") != "1":
        sh([py, run, *common, "-e", epochs, "--mode", "train",
            "--save_epochs", epochs], env=base_env)
        sh([py, run, *common, "-e", epochs, "--mode", "save_latent"],
           env=base_env)
        # train_latent_ddim loads the image ckpt by -e and saves the
        # latent model under its own epoch count
        sh([py, run, *common, "-e", epochs, "--mode", "train_latent_ddim",
            "--save_epochs", epochs], env=base_env)

    # --- both tiers, identical seeds -> identical draws ---
    img_dirs = {}
    for tier, name in (("", "bf16"), ("int8", "int8")):
        folder = os.path.join(work, f"imgs_{name}")
        sh([py, run, *common, "-e", epochs, "--mode", "eval_fid",
            "--is_latent", "--deterministic",
            "--sampling_steps", "100",
            "--sampling_number", str(n_samples),
            "--img_folder", folder],
           env={**base_env, "INFODIFF_TURBO": tier})
        # eval_fid writes under <img_folder>/<exp>/eval-fid-latent
        hits = []
        for root, _dirs, files in os.walk(folder):
            if root.endswith("eval-fid-latent") and files:
                hits.append(root)
        assert len(hits) == 1, (folder, hits)
        img_dirs[name] = hits[0]

    # --- real stats + scores ---
    real_a, real_b = dump_real_halves(work, real_n // 2, size)
    from infodiffusion_tpu.metrics.fid import compute_fid, make_custom_stats

    make_custom_stats("tfd_real", real_a)
    kwargs = dict(dataset_name="tfd_real", dataset_res=size,
                  num_gen=n_samples)
    floor = compute_fid(real_b, **kwargs)
    fid_bf16 = compute_fid(img_dirs["bf16"], **kwargs)
    fid_int8 = compute_fid(img_dirs["int8"], **kwargs)

    delta = abs(fid_int8 - fid_bf16)
    rec = {
        "fid_bf16": round(float(fid_bf16), 4),
        "fid_int8": round(float(fid_int8), 4),
        "delta": round(float(delta), 4),
        "real_floor": round(float(floor), 4),
        "delta_vs_bf16_pct": round(100.0 * delta / max(fid_bf16, 1e-9), 3),
        "n_samples": n_samples,
        "extractor": (
            "pt_inception" if os.environ.get("INFODIFF_INCEPTION_WEIGHTS")
            else "labeled-fallback"
        ),
        "verdict": tier_verdict(delta, fid_bf16, floor),
    }
    print(json.dumps(rec))
    with open(os.path.join(work, "turbo_fid_delta.json"), "w") as f:
        json.dump(rec, f)


if __name__ == "__main__":
    main()
