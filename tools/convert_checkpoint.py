#!/usr/bin/env python
"""Convert checkpoints between the reference's torch ``model-{e}.pth``
files and this framework's Orbax checkpoint directories, both ways.

A reference user switching over brings their trained ``.pth`` files; a
user leaving takes theirs back. The tensor-layout mapping (conv
OIHW<->HWIO, decoder NCHW<->NHWC permutation absorption, dead-CrossAttn
skip) is the tested interop layer (infodiffusion_tpu/interop.py,
tests/test_interop.py) — this tool is just its CLI.

Usage (same model flags as run.py so the architecture matches):

  torch -> orbax (then eval with run.py -e 50):
    python tools/convert_checkpoint.py \
        --src /ref/models/celeba_256d_0.1mmd/model-50.pth \
        --dst ./models/celeba_256d_0.1mmd/model-50 \
        --model diff --prior regular --dataset celeba --a_dim 256

  orbax -> torch (loadable by the reference's run.py eval):
    python tools/convert_checkpoint.py \
        --src ./models/celeba_256d_0.1mmd/model-50 \
        --dst /tmp/model-50.pth \
        --model diff --prior regular --dataset celeba --a_dim 256

Direction is inferred from --src: a ``.pth`` file converts torch->orbax,
a checkpoint directory converts orbax->torch. ``--latent`` converts the
auxiliary latent-DDIM model (the ``{exp}_latent`` family) instead.
Orbax->torch prefers EMA weights when present (like eval does); pass
--no_ema for the raw params.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from infodiffusion_tpu.cache import (
        enable_compilation_cache,
        force_cpu_if_requested,
    )

    force_cpu_if_requested()
    enable_compilation_cache()

    from infodiffusion_tpu.cli import build_parser

    p = build_parser(require_mode=False)
    p.add_argument("--src", required=True,
                   help="source: reference .pth file OR Orbax model-{e} dir")
    p.add_argument("--dst", required=True,
                   help="destination: Orbax model-{e} dir OR .pth file")
    p.add_argument("--latent", action="store_true",
                   help="convert the auxiliary latent-DDIM model "
                        "(LatentUNet Diff) instead of the main model")
    p.add_argument("--no_ema", action="store_true",
                   help="orbax->torch: export raw params even when the "
                        "checkpoint carries EMA weights")
    args = p.parse_args(argv)
    src, dst = args.src, args.dst
    if not src.endswith(".pth"):
        src = os.path.abspath(src)  # Orbax requires absolute paths
    latent, no_ema = args.latent, args.no_ema
    ns = {
        k: v for k, v in vars(args).items()
        if k not in ("src", "dst", "latent", "no_ema")
    }

    from infodiffusion_tpu.config import Config

    cfg = Config(**ns).with_dataset_config()

    import jax
    import jax.numpy as jnp
    import jax.random as jr
    import numpy as np

    from infodiffusion_tpu.models import build_model

    if latent:
        cfg = cfg.replace(is_latent=True)
        model = build_model(cfg, latent=True)
        x = jnp.zeros((1, cfg.a_dim))
    else:
        model = build_model(cfg)
        x = jnp.zeros((1, cfg.input_size, cfg.input_size,
                       cfg.input_channels))
    rngs = {
        "params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
        "reparam": jr.PRNGKey(2), "dropout": jr.PRNGKey(3),
    }
    # loss_fn traces every submodule (backbone AND encoder) — the same
    # init convention as runner._load_model_params
    init = jax.jit(
        lambda: model.init(rngs, x, 0, method=type(model).loss_fn)
    )

    if src.endswith(".pth"):
        if os.path.isdir(dst) and os.listdir(dst):
            raise SystemExit(f"--dst {dst} exists and is not empty")
        from infodiffusion_tpu.interop import load_torch_checkpoint

        variables = init()
        loaded = load_torch_checkpoint(model, variables["params"], src)
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            os.path.abspath(dst), jax.device_get({"params": loaded}),
            force=True,
        )
        ckptr.wait_until_finished()
        n = len(jax.tree.leaves(loaded))
        print(f"torch -> orbax: {src} -> {dst} ({n} param tensors); "
              f"eval with run.py -e <epoch> once placed under "
              f"{{model_folder}}/{{exp}}/model-{{epoch}}")
    else:
        if not os.path.isdir(src):
            raise SystemExit(
                f"--src {src} is neither a .pth file nor a checkpoint dir"
            )
        from infodiffusion_tpu.interop import export_torch_state_dict
        from infodiffusion_tpu.train.checkpoint import restore_params

        root, name = os.path.split(os.path.normpath(src))
        if not name.startswith("model-"):
            raise SystemExit(
                f"expected an Orbax model-{{epoch}} directory, got {src}"
            )
        epoch = int(name.split("-", 1)[1])
        shapes = jax.eval_shape(init)
        params = restore_params(root, epoch, shapes["params"],
                                prefer_ema=not no_ema)
        sd = export_torch_state_dict(model, params)
        import torch

        torch.save({k: torch.from_numpy(np.asarray(v))
                    for k, v in sd.items()}, dst)
        print(f"orbax -> torch: {src} -> {dst} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
