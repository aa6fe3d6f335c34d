"""Artifact-layout contract tests (reference: run.py:103-158,443)."""

import os

from infodiffusion_tpu.config import Config, generate_exp_string
from infodiffusion_tpu.runner import image_root, latent_npz_path, _mode_subdir
from infodiffusion_tpu.train.checkpoint import checkpoint_root


def _cfg(**kw):
    base = dict(dataset="celeba", a_dim=256, mmd_weight=0.1, prior="regular")
    base.update(kw)
    return Config(**base)


def test_exp_string_contract():
    # {dataset}_{a_dim}d[_{kld}kld[_{C}C]][_{mmd}mmd][_{prior}][_bottleneck]
    assert generate_exp_string(_cfg()) == "celeba_256d_0.1mmd"
    assert generate_exp_string(_cfg(mmd_weight=0)) == "celeba_256d"
    assert generate_exp_string(
        _cfg(kld_weight=0.01, use_C=True, C_max=25.0)
    ) == "celeba_256d_0.01kld_25.0C_0.1mmd"
    assert generate_exp_string(_cfg(prior="10mix")) == \
        "celeba_256d_0.1mmd_10mix"
    assert generate_exp_string(_cfg(is_bottleneck=True)) == \
        "celeba_256d_0.1mmd_bottleneck"


def test_image_root_model_subdirs():
    # vae -> imgs/vae/...; vanilla -> imgs/diff/...; diff -> imgs/...
    # (reference: run.py:104-110)
    assert image_root(_cfg(model="diff")).endswith(
        "./imgs/celeba_256d_0.1mmd")
    assert image_root(_cfg(model="vae")).endswith(
        "./imgs/vae/celeba_256d_0.1mmd")
    assert image_root(_cfg(model="vanilla")).endswith(
        "./imgs/diff/celeba_256d_0.1mmd")


def test_mode_subdirs():
    assert _mode_subdir(_cfg(mode="eval")) == "eval"
    assert _mode_subdir(_cfg(mode="disentangle", img_id=3)) == "disentangle-3"
    assert _mode_subdir(_cfg(mode="interpolate", img_id=7)) == "interpolate-7"
    assert _mode_subdir(_cfg(mode="save_latent")) == "save_latent"


def test_latent_npz_name_dots_replaced():
    # '{model}_{exp}_latent.npz' with dots -> underscores in exp
    # (reference: run.py:443)
    assert latent_npz_path(_cfg(model="diff")) == \
        "diff_celeba_256d_0_1mmd_latent.npz"


def test_checkpoint_root_layout():
    r = checkpoint_root(_cfg(model="diff"))
    assert r.endswith("models/celeba_256d_0.1mmd")
    r = checkpoint_root(_cfg(model="vanilla", mmd_weight=0))
    assert r.endswith("models/diff/celeba_256d")
    r = checkpoint_root(_cfg(model="vae"))
    assert r.endswith("models/vae/celeba_256d_0.1mmd")
    r = checkpoint_root(_cfg(model="diff"), latent=True)
    assert r.endswith("models/celeba_256d_0.1mmd_latent")
