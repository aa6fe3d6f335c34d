#!/usr/bin/env python
"""End-to-end representation-learning validation on rendered synthetic
dsprites (factor-dependent sprites — data/datasets.py _render_dsprites).

Trains an MMD-InfoDiff via the real CLI, encodes the dataset with
save_latent, then ridge-probes the aux latents against the ground-truth
factors. Demonstrates the framework's core purpose (the aux latent
captures generative factors) without any real dataset on disk.

Measured on a v5e chip (a_dim 8, T=50, 2048 sprites, 150 epochs,
~3 min wall with warm compile cache):
    ridge R2:  scale 0.70  posX 0.72  posY 0.56  shape 0.16
               orient ~0 (not rendered -> correctly uninformative)
    vs an untrained encoder at R2 <= ~0.08 on all factors.
    5-fold CLI protocol (eval_disentanglement.py --dataset dsprites):
    DCI 0.0201 +- 0.0011; linear-probe acc vs chance: Shape 0.46/0.33,
    Scale 0.40/0.17, PosX 0.13/0.03, PosY 0.14/0.03, Orient 0.02/0.025.

The TAD counterpart runs on factor-rendered synthetic CELEBA (5
flip-invariant binary factors, 35 nuisance bits; datasets._render_celeba)
with the flagship-size model:

    INFODIFF_SYNTHETIC_N=2048 python run.py --model diff --prior regular \
        --dataset celeba --a_dim 32 --data_dir synthetic \
        --diffusion_steps 50 --batch_size 32 --r_seed 5 -e 100 --bf16 \
        --mode train --save_epochs 100       # then save_latent, then
    python eval_disentanglement.py <same flags> --mode save_latent

Measured (v5e): rendered attrs probe at 0.92-1.00 acc, nuisance attrs
at chance; TAD 0.058 with 3 attributes captured per fold.

Usage:  python tools/repr_learning_demo.py [workdir]
"""

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMMON = [
    "--model", "diff", "--prior", "regular", "--dataset", "dsprites",
    "--a_dim", "8", "--data_dir", "synthetic", "--diffusion_steps", "50",
    "--batch_size", "64", "--r_seed", "3", "-e", "150",
]


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="infodiff_repr_"
    )
    os.makedirs(work, exist_ok=True)
    env = dict(os.environ, INFODIFF_SYNTHETIC_N="2048")
    run = os.path.join(REPO, "run.py")
    print(f"workdir: {work}")
    subprocess.run(
        [sys.executable, run, *COMMON, "--mode", "train",
         "--save_epochs", "150"],
        cwd=work, env=env, check=True,
    )
    subprocess.run(
        [sys.executable, run, *COMMON, "--mode", "save_latent"],
        cwd=work, env=env, check=True,
    )
    # the real 5-fold disentanglement protocol (DCI + linear probes)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "eval_disentanglement.py"),
         *COMMON, "--mode", "save_latent"],
        cwd=work, env=env, check=True,
    )

    import numpy as np
    from sklearn.linear_model import Ridge
    from sklearn.model_selection import train_test_split

    f = np.load(os.path.join(work, "diff_dsprites_8d_0_1mmd_latent.npz"))
    a, attr = f["all_a"], f["all_attr"]
    print(f"latents: {a.shape}")
    for i, nm in enumerate(
        ["color", "shape", "scale", "orient", "posX", "posY"]
    ):
        y = attr[:, i]
        if np.std(y) < 1e-9:
            continue
        xtr, xte, ytr, yte = train_test_split(
            a, y, test_size=0.3, random_state=0
        )
        r2 = Ridge(1.0).fit(xtr, ytr).score(xte, yte)
        print(f"  {nm}: R2={r2:.3f}")


if __name__ == "__main__":
    main()
