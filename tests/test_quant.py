"""int8 "turbo" inference tier (ops/quant.py, nn/blocks.py).

The reference has no quantized path (eager fp32 torch end to end) — this
is a beyond-parity TPU capability, so the oracle is our own f32 path:
W8A8 with per-output-channel weight scales and calibrated per-tensor
activation scales must track the f32 forward within the quantization
noise floor, calibration must not touch params, and the training path
must never see the 'quant' collection.
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from infodiffusion_tpu.nn.blocks import Conv3, ShortcutDense, _PieceConv3
from infodiffusion_tpu.ops import quant as q8


def _rel_l2(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)


def _calibrated(module, *args):
    """init -> one observe pass -> merged variables with 'quant'."""
    v = module.init(jr.PRNGKey(0), *args)
    _, q = module.apply(v, *args, mutable=["quant"])
    return v, {**v, **q}


def test_quantize_weight_bounds():
    k = jr.normal(jr.PRNGKey(0), (3, 3, 16, 32))
    q, scale = q8.quantize_weight(k, (0, 1, 2))
    assert q.dtype == jnp.int8 and scale.shape == (32,)
    recovered = q.astype(jnp.float32) * scale
    # symmetric rounding: per-element error <= scale/2 of that out-channel
    err = jnp.abs(recovered - k)
    assert bool(jnp.all(err <= scale / 2 + 1e-7))


def test_conv3_int8_close_to_f32():
    x = jr.normal(jr.PRNGKey(1), (2, 8, 8, 16))
    m = Conv3(features=32)
    v, vq = _calibrated(m, x)
    ref = m.apply(v, x)
    out = m.apply(vq, x)
    assert _rel_l2(out, ref) < 0.02


def test_conv3_stride2_int8_close():
    x = jr.normal(jr.PRNGKey(2), (2, 8, 8, 16))
    m = Conv3(features=16, strides=2)
    v, vq = _calibrated(m, x)
    ref = m.apply(v, x)
    out = m.apply(vq, x)
    assert out.shape == ref.shape == (2, 4, 4, 16)
    assert _rel_l2(out, ref) < 0.02


def test_conv3_quantize_false_ignores_quant():
    x = jr.normal(jr.PRNGKey(3), (2, 8, 8, 4))
    m = Conv3(features=8, quantize=False)
    v = m.init(jr.PRNGKey(0), x)
    _, q = m.apply(v, x, mutable=["quant"])
    assert not dict(q).get("quant")  # no observation site
    out = m.apply(v, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(m.apply(v, x)))


def test_shortcut_dense_stays_bf16_in_turbo():
    """The 1x1 shortcut is deliberately NOT quantized (bandwidth-bound;
    W8A8 measured slower there — nn/blocks.py ShortcutDense)."""
    x = jr.normal(jr.PRNGKey(4), (2, 8, 8, 16))
    m = ShortcutDense(features=32)
    v = m.init(jr.PRNGKey(0), x)
    _, q = m.apply(v, x, mutable=["quant"])
    assert not dict(q).get("quant")  # no observation site
    np.testing.assert_array_equal(
        np.asarray(m.apply(v, x)), np.asarray(m.apply(v, x))
    )


def test_conv3_repeat_matches_manual_upsample():
    """Conv3(repeat=2) == nearest-x2 then conv (exact in f32); in the
    int8 tier the pre-repeat quantize is exact too (|x| is repeat-
    invariant)."""
    x = jr.normal(jr.PRNGKey(9), (2, 4, 4, 16))
    m2 = Conv3(features=16, repeat=2)
    m1 = Conv3(features=16)
    v = m2.init(jr.PRNGKey(0), x)
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    np.testing.assert_allclose(
        np.asarray(m2.apply(v, x)), np.asarray(m1.apply(v, up)),
        atol=1e-6,
    )
    # int8: calibrate both; quantize-before-repeat == quantize-after
    _, q2 = m2.apply(v, x, mutable=["quant"])
    _, q1 = m1.apply(v, up, mutable=["quant"])
    out2 = m2.apply({**v, **q2}, x)
    out1 = m1.apply({**v, **q1}, up)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), atol=1e-6)


def test_piece_conv_int8_close_to_f32_concat():
    p1 = jr.normal(jr.PRNGKey(5), (2, 8, 8, 16))
    p2 = 3.0 * jr.normal(jr.PRNGKey(6), (2, 8, 8, 8))  # mismatched ranges
    m = _PieceConv3(features=32)
    v, vq = _calibrated(m, [p1, p2])
    # per-PIECE act scales: the small-range piece must not be crushed by
    # the large-range one's scale
    assert jnp.shape(vq["quant"]["act_absmax"]) == (2,)
    assert _rel_l2(m.apply(vq, [p1, p2]), m.apply(v, [p1, p2])) < 0.02


def _tiny_unet():
    from infodiffusion_tpu.models import AuxiliaryUNet

    return AuxiliaryUNet(
        T=10, a_dim=4, ch=32, ch_mult=(1, 2), attn=(1,), out_ch=1,
    )


def test_unet_int8_forward_close():
    model = _tiny_unet()
    x = jr.normal(jr.PRNGKey(7), (2, 16, 16, 1))
    t = jnp.array([3, 7], jnp.int32)
    a = jr.normal(jr.PRNGKey(8), (2, 4))
    v = jax.jit(lambda: model.init(jr.PRNGKey(0), x, t, a))()
    vq = q8.calibrate(model, v, (16, 16, 1), a_dim=4, T=10, batch=8)
    ref = model.apply(v, x, t, a)
    out = model.apply(vq, x, t, a)
    # full-depth W8A8 UNet vs f32: quantization noise accumulates over
    # ~10 conv stages; empirically ~11% relative on RANDOM weights (the
    # worst case — trained weights have structured, lower-kurtosis
    # activations). The sampler-level check below is the product bound.
    assert _rel_l2(out, ref) < 0.15


def test_init_has_no_quant_collection():
    model = _tiny_unet()
    v = jax.jit(
        lambda: model.init(
            jr.PRNGKey(0),
            jnp.zeros((1, 16, 16, 1)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 4)),
        )
    )()
    # is_initializing guard: init makes every collection mutable, but the
    # observe branch must NOT fire (it would pollute checkpoints)
    assert "quant" not in v


def test_calibrate_preserves_params_and_skips_head():
    model = _tiny_unet()
    v = jax.jit(
        lambda: model.init(
            jr.PRNGKey(0),
            jnp.zeros((1, 16, 16, 1)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 4)),
        )
    )()
    vq = q8.calibrate(model, v, (16, 16, 1), a_dim=4, T=10, batch=8)
    # params bit-identical (weights quantize inline at apply, not here)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        v["params"], vq["params"],
    )
    flat = jax.tree_util.tree_flatten_with_path(vq["quant"])[0]
    paths = ["/".join(str(k.key) for k in p if hasattr(k, "key"))
             for p, _ in flat]
    assert paths, "calibration observed no sites"
    # head conv pinned to the normal policy (quantize=False in unet.py);
    # tail_conv is a plain nn.Conv so it never appears either; shortcut
    # projections deliberately stay bf16 (ShortcutDense)
    assert not any(
        "head" in p or "tail" in p or "shortcut" in p for p in paths
    )
    # every observed absmax is strictly positive (scale well-defined)
    assert all(float(jnp.min(x)) > 0 for _, x in flat)


def test_diffusion_process_turbo_sampling():
    from infodiffusion_tpu.config import Config
    from infodiffusion_tpu.diffusion.samplers import DiffusionProcess
    from infodiffusion_tpu.models import Diff

    cfg = Config(model="vanilla", dataset="mnist", diffusion_steps=6,
                 deterministic=True, a_dim=4, input_size=16,
                 turbo="int8")
    model = Diff(T=6, shape=(1, 16, 16), unets_channels=32,
                 ch_mult=(1, 2), attn=(1,))
    x = jnp.zeros((1, 16, 16, 1))
    v = jax.jit(
        lambda: model.init(
            {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
             "dropout": jr.PRNGKey(2)},
            x, jnp.zeros((1,), jnp.int32),
        )
    )()
    p = DiffusionProcess(cfg, model, v, shape=(1, 16, 16))
    assert p.turbo == "int8" and "quant" in p.params
    out = p.sampling(jr.PRNGKey(0), sampling_number=4, num_steps=3)
    assert out.shape == (4, 16, 16, 1)
    assert bool(jnp.all(jnp.isfinite(out)))
    # trajectory must track the non-turbo sampler (same model/key)
    p0 = DiffusionProcess(cfg.replace(turbo=""), model, v,
                          shape=(1, 16, 16))
    ref = p0.sampling(jr.PRNGKey(0), sampling_number=4, num_steps=3)
    assert _rel_l2(out, ref) < 0.05


def test_int8x_collection_sites():
    """int8x calibration observes per-block raw-input ranges (x_absmax
    under .../xq) IN ADDITION to the conv act sites; plain int8 must not
    create them (the variable's presence is what switches the block)."""
    model = _tiny_unet()
    v = jax.jit(
        lambda: model.init(
            jr.PRNGKey(0),
            jnp.zeros((1, 16, 16, 1)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 4)),
        )
    )()
    v8 = q8.calibrate(model, v, (16, 16, 1), a_dim=4, T=10, batch=8)
    vx = q8.calibrate(model, v, (16, 16, 1), a_dim=4, T=10, batch=8,
                      mode="int8x")
    flat8 = jax.tree_util.tree_flatten_with_path(v8["quant"])[0]
    flatx = jax.tree_util.tree_flatten_with_path(vx["quant"])[0]
    names8 = {p[-1].key for p, _ in flat8}
    namesx = {p[-1].key for p, _ in flatx}
    assert "x_absmax" not in names8
    assert "x_absmax" in namesx and "act_absmax" in namesx
    assert all(float(jnp.min(x)) > 0 for _, x in flatx)
    # calib mode flag is restored after calibration
    assert q8.calib_mode() == ""


def test_unet_int8x_forward_close():
    """The aggressive tier adds one quantization on the residual-stream
    READS (norm1 + shortcut inputs); the bf16 carry is untouched, so the
    error stays in the int8 regime (looser than plain int8)."""
    model = _tiny_unet()
    x = jr.normal(jr.PRNGKey(7), (2, 16, 16, 1))
    t = jnp.array([3, 7], jnp.int32)
    a = jr.normal(jr.PRNGKey(8), (2, 4))
    v = jax.jit(lambda: model.init(jr.PRNGKey(0), x, t, a))()
    vx = q8.calibrate(model, v, (16, 16, 1), a_dim=4, T=10, batch=8,
                      mode="int8x")
    ref = model.apply(v, x, t, a)
    out = model.apply(vx, x, t, a)
    assert _rel_l2(out, ref) < 0.25
    assert bool(jnp.all(jnp.isfinite(out)))


def test_int8_shortcut_matches_f32():
    """ops.quant.int8_shortcut (the folded-scale s8 shortcut) tracks the
    f32 projection within the quantization noise floor, mismatched piece
    ranges included."""
    from infodiffusion_tpu.ops.quant import (
        int8_shortcut, quantize_x_pieces,
    )

    p1 = jr.normal(jr.PRNGKey(0), (2, 8, 8, 16))
    p2 = 4.0 * jr.normal(jr.PRNGKey(1), (2, 8, 8, 8))
    kernel = jr.normal(jr.PRNGKey(2), (24, 32)) * 0.2
    bias = jr.normal(jr.PRNGKey(3), (32,)) * 0.1
    res = jr.normal(jr.PRNGKey(4), (2, 8, 8, 32))
    absmax = jnp.stack(
        [jnp.max(jnp.abs(p1)), jnp.max(jnp.abs(p2))]
    )
    qx = quantize_x_pieces([p1, p2], absmax)
    out = int8_shortcut(qx, kernel, bias, jnp.float32, residual=res)
    ref = res + jnp.concatenate([p1, p2], -1) @ kernel + bias
    assert _rel_l2(out, ref) < 0.02


def test_diffusion_process_int8x_sampling():
    from infodiffusion_tpu.config import Config
    from infodiffusion_tpu.diffusion.samplers import DiffusionProcess
    from infodiffusion_tpu.models import Diff

    cfg = Config(model="vanilla", dataset="mnist", diffusion_steps=6,
                 deterministic=True, a_dim=4, input_size=16,
                 turbo="int8x")
    model = Diff(T=6, shape=(1, 16, 16), unets_channels=32,
                 ch_mult=(1, 2), attn=(1,))
    x = jnp.zeros((1, 16, 16, 1))
    v = jax.jit(
        lambda: model.init(
            {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
             "dropout": jr.PRNGKey(2)},
            x, jnp.zeros((1,), jnp.int32),
        )
    )()
    p = DiffusionProcess(cfg, model, v, shape=(1, 16, 16))
    assert p.turbo == "int8x"
    out = p.sampling(jr.PRNGKey(0), sampling_number=4, num_steps=3)
    assert out.shape == (4, 16, 16, 1)
    assert bool(jnp.all(jnp.isfinite(out)))
    p0 = DiffusionProcess(cfg.replace(turbo=""), model, v,
                          shape=(1, 16, 16))
    ref = p0.sampling(jr.PRNGKey(0), sampling_number=4, num_steps=3)
    assert _rel_l2(out, ref) < 0.1


def test_cli_turbo_int8x_flag():
    from infodiffusion_tpu.cli import parse_args

    cfg = parse_args(
        "--model vanilla --mode eval --prior regular --dataset mnist "
        "--a_dim 32 --turbo int8x".split()
    )
    assert cfg.turbo == "int8x"


def test_turbo_rejects_unknown_mode():
    from infodiffusion_tpu.config import Config

    with pytest.raises(ValueError):
        Config(model="vanilla", dataset="mnist", turbo="fp4")


def test_cli_turbo_flag():
    from infodiffusion_tpu.cli import parse_args

    cfg = parse_args(
        "--model vanilla --mode eval --prior regular --dataset mnist "
        "--a_dim 32 --turbo int8".split()
    )
    assert cfg.turbo == "int8"


def test_turbo_off_beats_env(monkeypatch):
    """--turbo off must defeat an exported INFODIFF_TURBO (the only CLI
    escape hatch, since '' means "fall through to the env")."""
    from infodiffusion_tpu.config import Config
    from infodiffusion_tpu.diffusion.samplers import _resolve_turbo

    monkeypatch.setenv("INFODIFF_TURBO", "int8")
    cfg = Config(model="vanilla", dataset="mnist")
    assert _resolve_turbo(cfg, None) == "int8"          # '' falls through
    assert _resolve_turbo(cfg.replace(turbo="off"), None) == ""
    assert _resolve_turbo(cfg, "off") == ""             # explicit arg
    assert _resolve_turbo(cfg.replace(turbo="off"), "int8") == "int8"


def _tiny_infodiff():
    from infodiffusion_tpu.models import InfoDiff

    return InfoDiff(T=10, a_dim=4, shape=(1, 16, 16), unets_channels=32,
                    encoder_channels=32, mmd_weight=0.1, epochs=5)


def test_calibrate_encoder_and_turbo_encode():
    """Encoder turbo tier (the save_latent workhorse): calibrate_encoder
    observes the Encoder's conv sites, the quantized encode tracks the
    f32 encode in the int8 noise floor, and the latent-selection
    (a vs mu) structure is unchanged."""
    from infodiffusion_tpu.train.step import make_eval_encode_step

    model = _tiny_infodiff()
    x = jr.normal(jr.PRNGKey(7), (4, 16, 16, 1))
    v = jax.jit(
        lambda: model.init(
            {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
             "reparam": jr.PRNGKey(2), "dropout": jr.PRNGKey(3)},
            jnp.zeros((1, 16, 16, 1)), 0, method=type(model).loss_fn,
        )
    )()
    quant = q8.calibrate_encoder(model, v, x=x)
    flat = jax.tree_util.tree_flatten_with_path(quant)[0]
    paths = ["/".join(str(k.key) for k in p if hasattr(k, "key"))
             for p, _ in flat]
    assert any("encoder" in p for p in paths)
    # the denoising UNet never runs in encode — no sites observed there
    assert all("encoder" in p for p in paths)
    enc = make_eval_encode_step(model)
    ref = enc(v["params"], x, None)
    out = enc(v["params"], x, quant)
    assert out.shape == ref.shape
    assert _rel_l2(out, ref) < 0.15  # random-weight noise floor, cf.
    # test_unet_int8_forward_close


def test_runner_encoder_quant_gated_on_turbo():
    from infodiffusion_tpu.config import Config
    from infodiffusion_tpu.runner import _encoder_quant

    model = _tiny_infodiff()
    x = jnp.zeros((2, 16, 16, 1))
    v = jax.jit(
        lambda: model.init(
            {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
             "reparam": jr.PRNGKey(2), "dropout": jr.PRNGKey(3)},
            x, 0, method=type(model).loss_fn,
        )
    )()
    cfg = Config(model="diff", dataset="mnist", a_dim=4, input_size=16)
    assert _encoder_quant(cfg, model, v, x) is None
    q = _encoder_quant(cfg.replace(turbo="int8"), model, v, x)
    assert q is not None and len(jax.tree.leaves(q)) > 0


def test_runner_encoder_quant_cache_identity_guard():
    """The calibration cache must re-verify the VARIABLES OBJECT on
    hit, not trust id() alone: a new dict allocated at a recycled
    address (two checkpoints of one config evaluated in sequence) must
    recalibrate, never serve the old checkpoint's scales."""
    from infodiffusion_tpu import runner
    from infodiffusion_tpu.config import Config
    from infodiffusion_tpu.runner import _encoder_quant

    model = _tiny_infodiff()
    x = jnp.zeros((2, 16, 16, 1))
    v1 = jax.jit(
        lambda: model.init(
            {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
             "reparam": jr.PRNGKey(2), "dropout": jr.PRNGKey(3)},
            x, 0, method=type(model).loss_fn,
        )
    )()
    cfg = Config(model="diff", dataset="mnist", a_dim=4, input_size=16,
                 turbo="int8")
    q1 = _encoder_quant(cfg, model, v1, x)
    # same object => cache hit (identical collection object back)
    assert _encoder_quant(cfg, model, v1, x) is q1
    # simulate an id() collision: a DIFFERENT variables dict whose key
    # aliases v1's entry — the identity check must force recalibration
    v2 = dict(v1)
    assert v2 is not v1
    key = (model, "int8", id(v2))
    runner._ENCODER_QUANT_CACHE[key] = (v1, q1)
    q2 = _encoder_quant(cfg, model, v2, x)
    assert runner._ENCODER_QUANT_CACHE[key][0] is v2
    assert q2 is not q1
    # eviction keeps the cache bounded
    assert len(runner._ENCODER_QUANT_CACHE) <= (
        runner._ENCODER_QUANT_CACHE_MAX
    )
