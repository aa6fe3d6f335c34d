"""Tests for the config surface and experiment-string naming contract
(reference: utils.py:49-61, data.py:63-102)."""

import pytest

from infodiffusion_tpu.config import Config, generate_exp_string


def test_exp_string_default_mmd():
    cfg = Config(dataset="celeba", a_dim=256, mmd_weight=0.1)
    assert generate_exp_string(cfg) == "celeba_256d_0.1mmd"


def test_exp_string_kld_with_capacity():
    cfg = Config(
        dataset="mnist", a_dim=32, mmd_weight=0.0, kld_weight=1.0,
        use_C=True, C_max=25.0,
    )
    assert generate_exp_string(cfg) == "mnist_32d_1.0kld_25.0C"


def test_exp_string_prior_and_bottleneck():
    cfg = Config(
        dataset="fmnist", a_dim=16, mmd_weight=0.1, prior="10mix",
        is_bottleneck=True,
    )
    assert generate_exp_string(cfg) == "fmnist_16d_0.1mmd_10mix_bottleneck"


def test_dataset_config_overrides():
    cfg = Config(dataset="celeba", unets_channels=999).with_dataset_config()
    assert cfg.input_channels == 3
    assert cfg.unets_channels == 64
    assert cfg.encoder_channels == 64
    assert cfg.input_size == 64
    assert cfg.shape == (3, 64, 64)

    cfg = Config(dataset="mnist").with_dataset_config()
    assert cfg.shape == (1, 32, 32)
    assert cfg.unets_channels == 32

    cfg = Config(dataset="cifar10").with_dataset_config()
    assert cfg.shape == (3, 32, 32)
    assert cfg.unets_channels == 64

    cfg = Config(dataset="chairs").with_dataset_config()
    assert cfg.shape == (3, 64, 64)
    assert cfg.unets_channels == 32


def test_latent_shape():
    cfg = Config(a_dim=256)
    assert cfg.latent_shape == (1, 256, 256)


def test_invalid_choices_raise():
    with pytest.raises(ValueError):
        Config(model="nope")
    with pytest.raises(ValueError):
        Config(mode="nope")
    with pytest.raises(ValueError):
        Config(prior="nope")
    with pytest.raises(ValueError):
        Config(dataset="nope")
