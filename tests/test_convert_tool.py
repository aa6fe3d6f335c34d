"""tools/convert_checkpoint.py: the CLI over the interop layer.

Round-trip oracle: a reference-layout .pth (produced by the tested
export_torch_state_dict) -> Orbax dir -> .pth must be bit-identical, and
the intermediate Orbax dir must be loadable by the eval restore path
(restore_params), since that is the tool's whole point."""

import os
import sys

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FLAGS = (
    "--model diff --prior regular --dataset mnist --a_dim 16 "
    "--unets_channels 32 --encoder_channels 32 --diffusion_steps 8"
).split()


def _tiny_model_and_params():
    from infodiffusion_tpu.config import Config
    from infodiffusion_tpu.models import build_model

    cfg = Config(
        model="diff", prior="regular", dataset="mnist", a_dim=16,
        unets_channels=32, encoder_channels=32, diffusion_steps=8,
    ).with_dataset_config()
    model = build_model(cfg)
    x = jnp.zeros((1, cfg.input_size, cfg.input_size, cfg.input_channels))
    rngs = {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
            "reparam": jr.PRNGKey(2), "dropout": jr.PRNGKey(3)}
    v = jax.jit(
        lambda: model.init(rngs, x, 0, method=type(model).loss_fn)
    )()
    return model, v


def test_convert_round_trip(tmp_path, monkeypatch):
    from infodiffusion_tpu.interop import export_torch_state_dict
    from infodiffusion_tpu.train.checkpoint import restore_params
    from tools import convert_checkpoint as cc

    model, v = _tiny_model_and_params()
    sd = export_torch_state_dict(model, v["params"])
    pth = tmp_path / "ref.pth"
    torch.save(
        {k: torch.from_numpy(np.asarray(a)) for k, a in sd.items()}, pth
    )
    ckpt = tmp_path / "models" / "mnist_16d_0.1mmd" / "model-8"
    cc.main(["--src", str(pth), "--dst", str(ckpt)] + FLAGS)

    # the produced dir must satisfy the EVAL restore path
    shapes = jax.eval_shape(lambda: v)["params"]
    restored = restore_params(str(ckpt.parent), 8, shapes)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        restored, v["params"],
    )

    back = tmp_path / "back.pth"
    cc.main(["--src", str(ckpt), "--dst", str(back)] + FLAGS)
    sd2 = torch.load(back)
    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(np.asarray(sd[k]), sd2[k].numpy())


def test_convert_rejects_bad_src(tmp_path):
    from tools import convert_checkpoint as cc

    with pytest.raises(SystemExit):
        cc.main(["--src", str(tmp_path / "nope"), "--dst", "x.pth"] + FLAGS)
