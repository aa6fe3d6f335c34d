"""InceptionV3 FID feature extractor in pure JAX (TPU-native).

This is the network behind every published FID number: the TF-Inception
port used by pytorch-fid / clean-fid (``pt_inception-2015-12-05``), i.e.
torchvision's InceptionV3 with the FID modifications (average pools with
``count_include_pad=False`` in the A/C/E blocks and a max pool in the
pool branch of the final E block). Reference usage: the upstream repo
scores FID through clean-fid (calc_fid.py:6-14), whose extractor is this
architecture; here it runs as a single jitted NHWC forward on TPU
instead of a torch CPU/GPU pass.

The environment has no network egress, so weights cannot be downloaded;
instead :func:`load_params` converts a locally provided torch
``state_dict`` checkpoint (``INFODIFF_INCEPTION_WEIGHTS=/path/to/
pt_inception-2015-12-05-6726825d.pth``, or the standard torch-hub cache
location) into folded conv weights:

- every ``BasicConv2d`` (conv-no-bias + BatchNorm(eps=1e-3) + ReLU) is
  folded at load time into a single biased conv:
  ``w' = w * gamma / sqrt(var + eps)``, ``b' = beta - mean * gamma /
  sqrt(var + eps)`` — eval-mode BatchNorm is affine, so this is exact
  and saves a full elementwise pass per conv on TPU.
- torch OIHW kernels become HWIO for NHWC ``lax.conv``.

Numerics are guarded by tests/test_inception.py, which builds the same
architecture from raw ``torch.nn.functional`` ops on random weights and
checks the JAX forward against it — so with real pt_inception weights
the features match pytorch-fid's torch pipeline.

Parity scope (stated precisely): this is pytorch-fid's FID network fed
through clean-fid's antialiased "clean" resize. clean-fid's own clean
mode uses a torchscript TF-Inception port instead of pt_inception; the
two are ports of the same TF graph (the FID pool modifications exist to
match it) but are not bit-identical, so scores here are
pytorch-fid-exact and clean-fid-near (divergence recorded in PARITY.md
D8). The normalization (2·x/255 − 1 == x/127.5 − 1) matches both.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Tuple

import numpy as np

EPS = 1e-3  # BasicConv2d BatchNorm eps
FEATURE_DIM = 2048
INPUT_SIZE = 299

# ---------------------------------------------------------------------------
# conv spec table: state_dict prefix -> (in_ch, out_ch, (kh, kw), stride,
# (pad_h, pad_w)). Order matters only for readability; lookups are by name.
# ---------------------------------------------------------------------------


def _inception_a(prefix: str, in_ch: int, pool_f: int):
    return [
        (f"{prefix}.branch1x1", in_ch, 64, (1, 1), 1, (0, 0)),
        (f"{prefix}.branch5x5_1", in_ch, 48, (1, 1), 1, (0, 0)),
        (f"{prefix}.branch5x5_2", 48, 64, (5, 5), 1, (2, 2)),
        (f"{prefix}.branch3x3dbl_1", in_ch, 64, (1, 1), 1, (0, 0)),
        (f"{prefix}.branch3x3dbl_2", 64, 96, (3, 3), 1, (1, 1)),
        (f"{prefix}.branch3x3dbl_3", 96, 96, (3, 3), 1, (1, 1)),
        (f"{prefix}.branch_pool", in_ch, pool_f, (1, 1), 1, (0, 0)),
    ]


def _inception_b(prefix: str, in_ch: int):
    return [
        (f"{prefix}.branch3x3", in_ch, 384, (3, 3), 2, (0, 0)),
        (f"{prefix}.branch3x3dbl_1", in_ch, 64, (1, 1), 1, (0, 0)),
        (f"{prefix}.branch3x3dbl_2", 64, 96, (3, 3), 1, (1, 1)),
        (f"{prefix}.branch3x3dbl_3", 96, 96, (3, 3), 2, (0, 0)),
    ]


def _inception_c(prefix: str, in_ch: int, c7: int):
    return [
        (f"{prefix}.branch1x1", in_ch, 192, (1, 1), 1, (0, 0)),
        (f"{prefix}.branch7x7_1", in_ch, c7, (1, 1), 1, (0, 0)),
        (f"{prefix}.branch7x7_2", c7, c7, (1, 7), 1, (0, 3)),
        (f"{prefix}.branch7x7_3", c7, 192, (7, 1), 1, (3, 0)),
        (f"{prefix}.branch7x7dbl_1", in_ch, c7, (1, 1), 1, (0, 0)),
        (f"{prefix}.branch7x7dbl_2", c7, c7, (7, 1), 1, (3, 0)),
        (f"{prefix}.branch7x7dbl_3", c7, c7, (1, 7), 1, (0, 3)),
        (f"{prefix}.branch7x7dbl_4", c7, c7, (7, 1), 1, (3, 0)),
        (f"{prefix}.branch7x7dbl_5", c7, 192, (1, 7), 1, (0, 3)),
        (f"{prefix}.branch_pool", in_ch, 192, (1, 1), 1, (0, 0)),
    ]


def _inception_d(prefix: str, in_ch: int):
    return [
        (f"{prefix}.branch3x3_1", in_ch, 192, (1, 1), 1, (0, 0)),
        (f"{prefix}.branch3x3_2", 192, 320, (3, 3), 2, (0, 0)),
        (f"{prefix}.branch7x7x3_1", in_ch, 192, (1, 1), 1, (0, 0)),
        (f"{prefix}.branch7x7x3_2", 192, 192, (1, 7), 1, (0, 3)),
        (f"{prefix}.branch7x7x3_3", 192, 192, (7, 1), 1, (3, 0)),
        (f"{prefix}.branch7x7x3_4", 192, 192, (3, 3), 2, (0, 0)),
    ]


def _inception_e(prefix: str, in_ch: int):
    return [
        (f"{prefix}.branch1x1", in_ch, 320, (1, 1), 1, (0, 0)),
        (f"{prefix}.branch3x3_1", in_ch, 384, (1, 1), 1, (0, 0)),
        (f"{prefix}.branch3x3_2a", 384, 384, (1, 3), 1, (0, 1)),
        (f"{prefix}.branch3x3_2b", 384, 384, (3, 1), 1, (1, 0)),
        (f"{prefix}.branch3x3dbl_1", in_ch, 448, (1, 1), 1, (0, 0)),
        (f"{prefix}.branch3x3dbl_2", 448, 384, (3, 3), 1, (1, 1)),
        (f"{prefix}.branch3x3dbl_3a", 384, 384, (1, 3), 1, (0, 1)),
        (f"{prefix}.branch3x3dbl_3b", 384, 384, (3, 1), 1, (1, 0)),
        (f"{prefix}.branch_pool", in_ch, 192, (1, 1), 1, (0, 0)),
    ]


def conv_specs() -> List[Tuple[str, int, int, Tuple[int, int], int, Tuple[int, int]]]:
    """All BasicConv2d units as (name, in, out, kernel, stride, pad)."""
    specs = [
        ("Conv2d_1a_3x3", 3, 32, (3, 3), 2, (0, 0)),
        ("Conv2d_2a_3x3", 32, 32, (3, 3), 1, (0, 0)),
        ("Conv2d_2b_3x3", 32, 64, (3, 3), 1, (1, 1)),
        ("Conv2d_3b_1x1", 64, 80, (1, 1), 1, (0, 0)),
        ("Conv2d_4a_3x3", 80, 192, (3, 3), 1, (0, 0)),
    ]
    specs += _inception_a("Mixed_5b", 192, 32)
    specs += _inception_a("Mixed_5c", 256, 64)
    specs += _inception_a("Mixed_5d", 288, 64)
    specs += _inception_b("Mixed_6a", 288)
    specs += _inception_c("Mixed_6b", 768, 128)
    specs += _inception_c("Mixed_6c", 768, 160)
    specs += _inception_c("Mixed_6d", 768, 160)
    specs += _inception_c("Mixed_6e", 768, 192)
    specs += _inception_d("Mixed_7a", 768)
    specs += _inception_e("Mixed_7b", 1280)
    specs += _inception_e("Mixed_7c", 2048)
    return specs


# ---------------------------------------------------------------------------
# weight loading / BN folding
# ---------------------------------------------------------------------------


def fold_state_dict(state_dict) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """torch state_dict -> {conv name: (w HWIO f32, b f32)} with BN folded."""
    params: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for name, _in, _out, _k, _s, _p in conv_specs():
        w = np.asarray(state_dict[f"{name}.conv.weight"], np.float32)  # OIHW
        gamma = np.asarray(state_dict[f"{name}.bn.weight"], np.float32)
        beta = np.asarray(state_dict[f"{name}.bn.bias"], np.float32)
        mean = np.asarray(state_dict[f"{name}.bn.running_mean"], np.float32)
        var = np.asarray(state_dict[f"{name}.bn.running_var"], np.float32)
        scale = gamma / np.sqrt(var + EPS)
        w = w * scale[:, None, None, None]
        b = beta - mean * scale
        params[name] = (w.transpose(2, 3, 1, 0), b)  # OIHW -> HWIO
    return params


def default_weights_path() -> str | None:
    """Locate a pt_inception checkpoint: env var, then torch-hub cache."""
    env = os.environ.get("INFODIFF_INCEPTION_WEIGHTS")
    if env:
        if os.path.exists(env):
            return env
        # a set-but-bad path must not silently degrade to the fallback
        # extractor ("set INFODIFF_INCEPTION_WEIGHTS" advice would then
        # gaslight a user who already set it)
        import warnings

        warnings.warn(
            f"INFODIFF_INCEPTION_WEIGHTS points at a nonexistent path: "
            f"{env!r} — ignoring it"
        )
        return None
    hub = os.path.join(
        os.path.expanduser("~"), ".cache", "torch", "hub", "checkpoints"
    )
    if os.path.isdir(hub):
        for f in sorted(os.listdir(hub)):
            if f.startswith("pt_inception") and f.endswith(".pth"):
                return os.path.join(hub, f)
    return None


def load_params(path: str) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    sd = {k: v.numpy() for k, v in obj.items() if hasattr(v, "numpy")}
    return fold_state_dict(sd)


# ---------------------------------------------------------------------------
# drop-in weights contract (offline verification — real-weights day is
# provably turn-key: tools/verify_inception_weights.py validates a
# candidate file against this schema before anyone trusts an FID number)
# ---------------------------------------------------------------------------

#: the canonical pytorch-fid checkpoint this extractor is built for
#: (distributed from the pytorch-fid GitHub release "fid_weights";
#: clean-fid and the reference's calc_fid.py score through the same
#: TF-Inception port — /root/reference/calc_fid.py:6-14).
CANONICAL_WEIGHTS_FILENAME = "pt_inception-2015-12-05-6726825d.pth"

#: torch.hub filename convention: the trailing hex group is the first 8
#: hex digits of the file's SHA-256. The full digest is not recorded
#: anywhere offline-accessible, so the prefix is the strongest offline
#: identity check available; a candidate whose digest does not start
#: with this is NOT the canonical release file (it may still be
#: schema-valid, e.g. a re-saved copy — the verifier reports both).
CANONICAL_SHA256_PREFIX = "6726825d"


def expected_state_dict_schema() -> Dict[str, Tuple[int, ...]]:
    """Every tensor the loader consumes, name -> exact shape.

    Derived from :func:`conv_specs`: per BasicConv2d, a bias-free OIHW
    conv weight plus the four eval-mode BatchNorm vectors. The canonical
    file also carries ``fc.weight``/``fc.bias`` (the 1008-way TF logits
    head) and per-BN ``num_batches_tracked`` scalars; those are ignored
    by :func:`fold_state_dict` and deliberately NOT required here."""
    schema: Dict[str, Tuple[int, ...]] = {}
    for name, cin, cout, (kh, kw), _s, _p in conv_specs():
        schema[f"{name}.conv.weight"] = (cout, cin, kh, kw)
        for part in ("weight", "bias", "running_mean", "running_var"):
            schema[f"{name}.bn.{part}"] = (cout,)
    return schema

#: known-in-canonical-file extras the verifier should not flag as alien
CANONICAL_EXTRA_KEYS = ("fc.weight", "fc.bias")


def verify_state_dict_schema(sd) -> Tuple[bool, List[str]]:
    """Validate a mapping of name -> array-like against the schema.

    Returns ``(ok, problems)``: ok means every required tensor exists
    with the exact expected shape. Unknown keys (beyond the canonical
    fc head and BN bookkeeping scalars) are reported as notes but do
    not fail verification — the loader ignores them."""
    problems: List[str] = []
    schema = expected_state_dict_schema()
    for key, want in schema.items():
        if key not in sd:
            problems.append(f"missing tensor: {key} (want shape {want})")
            continue
        got = tuple(np.asarray(sd[key]).shape)
        if got != want:
            problems.append(f"shape mismatch: {key} has {got}, want {want}")
    ok = not problems
    for key in sd:
        if key in schema or key in CANONICAL_EXTRA_KEYS:
            continue
        if key.endswith(".bn.num_batches_tracked"):
            continue
        problems.append(f"note: unrecognized key ignored by loader: {key}")
    return ok, problems


# ---------------------------------------------------------------------------
# forward (NHWC, f32)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _conv_geometry() -> Dict[str, Tuple[int, Tuple[int, int]]]:
    """name -> (stride, pad), straight from the spec table — forward()
    has a single source of truth for conv geometry."""
    return {name: (s, p) for name, _i, _o, _k, s, p in conv_specs()}


def _conv(x, p, name):
    import jax
    import jax.numpy as jnp

    w, b = p[name]
    stride, pad = _conv_geometry()[name]
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), window_strides=(stride, stride),
        padding=((pad[0], pad[0]), (pad[1], pad[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y + jnp.asarray(b))


def _max_pool(x, window=3, stride=2, pad=0):
    import jax.lax as lax
    import jax.numpy as jnp

    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, window, window, 1), (1, stride, stride, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


def _avg_pool_nopad_count(x, window=3, stride=1, pad=1):
    """avg_pool2d(count_include_pad=False): divide by in-bounds counts."""
    import jax.lax as lax
    import jax.numpy as jnp

    dims = (1, window, window, 1)
    strides = (1, stride, stride, 1)
    pads = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    s = lax.reduce_window(x, 0.0, lax.add, dims, strides, pads)
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    cnt = lax.reduce_window(ones, 0.0, lax.add, dims, strides, pads)
    return s / cnt


def _block_a(x, p, prefix):
    import jax.numpy as jnp

    b1 = _conv(x, p, f"{prefix}.branch1x1")
    b5 = _conv(x, p, f"{prefix}.branch5x5_1")
    b5 = _conv(b5, p, f"{prefix}.branch5x5_2")
    b3 = _conv(x, p, f"{prefix}.branch3x3dbl_1")
    b3 = _conv(b3, p, f"{prefix}.branch3x3dbl_2")
    b3 = _conv(b3, p, f"{prefix}.branch3x3dbl_3")
    bp = _avg_pool_nopad_count(x)
    bp = _conv(bp, p, f"{prefix}.branch_pool")
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _block_b(x, p, prefix):
    import jax.numpy as jnp

    b3 = _conv(x, p, f"{prefix}.branch3x3")
    bd = _conv(x, p, f"{prefix}.branch3x3dbl_1")
    bd = _conv(bd, p, f"{prefix}.branch3x3dbl_2")
    bd = _conv(bd, p, f"{prefix}.branch3x3dbl_3")
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _block_c(x, p, prefix):
    import jax.numpy as jnp

    b1 = _conv(x, p, f"{prefix}.branch1x1")
    b7 = _conv(x, p, f"{prefix}.branch7x7_1")
    b7 = _conv(b7, p, f"{prefix}.branch7x7_2")
    b7 = _conv(b7, p, f"{prefix}.branch7x7_3")
    bd = _conv(x, p, f"{prefix}.branch7x7dbl_1")
    bd = _conv(bd, p, f"{prefix}.branch7x7dbl_2")
    bd = _conv(bd, p, f"{prefix}.branch7x7dbl_3")
    bd = _conv(bd, p, f"{prefix}.branch7x7dbl_4")
    bd = _conv(bd, p, f"{prefix}.branch7x7dbl_5")
    bp = _avg_pool_nopad_count(x)
    bp = _conv(bp, p, f"{prefix}.branch_pool")
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _block_d(x, p, prefix):
    import jax.numpy as jnp

    b3 = _conv(x, p, f"{prefix}.branch3x3_1")
    b3 = _conv(b3, p, f"{prefix}.branch3x3_2")
    b7 = _conv(x, p, f"{prefix}.branch7x7x3_1")
    b7 = _conv(b7, p, f"{prefix}.branch7x7x3_2")
    b7 = _conv(b7, p, f"{prefix}.branch7x7x3_3")
    b7 = _conv(b7, p, f"{prefix}.branch7x7x3_4")
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _block_e(x, p, prefix, pool: str):
    import jax.numpy as jnp

    b1 = _conv(x, p, f"{prefix}.branch1x1")
    b3 = _conv(x, p, f"{prefix}.branch3x3_1")
    b3 = jnp.concatenate(
        [
            _conv(b3, p, f"{prefix}.branch3x3_2a"),
            _conv(b3, p, f"{prefix}.branch3x3_2b"),
        ],
        axis=-1,
    )
    bd = _conv(x, p, f"{prefix}.branch3x3dbl_1")
    bd = _conv(bd, p, f"{prefix}.branch3x3dbl_2")
    bd = jnp.concatenate(
        [
            _conv(bd, p, f"{prefix}.branch3x3dbl_3a"),
            _conv(bd, p, f"{prefix}.branch3x3dbl_3b"),
        ],
        axis=-1,
    )
    # FIDInceptionE_2 (Mixed_7c) uses a max pool here to match TF-Inception.
    bp = _max_pool(x, stride=1, pad=1) if pool == "max" else _avg_pool_nopad_count(x)
    bp = _conv(bp, p, f"{prefix}.branch_pool")
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def forward(params, x):
    """x: [B, 299, 299, 3] float32 in [0, 1] -> [B, 2048] features."""
    import jax.numpy as jnp

    h = x * 2.0 - 1.0  # TF-Inception input scaling (normalize_input)
    h = _conv(h, params, "Conv2d_1a_3x3")
    h = _conv(h, params, "Conv2d_2a_3x3")
    h = _conv(h, params, "Conv2d_2b_3x3")
    h = _max_pool(h)
    h = _conv(h, params, "Conv2d_3b_1x1")
    h = _conv(h, params, "Conv2d_4a_3x3")
    h = _max_pool(h)
    h = _block_a(h, params, "Mixed_5b")
    h = _block_a(h, params, "Mixed_5c")
    h = _block_a(h, params, "Mixed_5d")
    h = _block_b(h, params, "Mixed_6a")
    h = _block_c(h, params, "Mixed_6b")
    h = _block_c(h, params, "Mixed_6c")
    h = _block_c(h, params, "Mixed_6d")
    h = _block_c(h, params, "Mixed_6e")
    h = _block_d(h, params, "Mixed_7a")
    h = _block_e(h, params, "Mixed_7b", pool="avg")
    h = _block_e(h, params, "Mixed_7c", pool="max")
    return jnp.mean(h, axis=(1, 2))  # adaptive avg pool -> [B, 2048]


# ---------------------------------------------------------------------------
# clean-mode resize + extractor factory
# ---------------------------------------------------------------------------


def clean_resize(batch_u8: np.ndarray, size: int = INPUT_SIZE) -> np.ndarray:
    """clean-fid's "clean" resize: float PIL bicubic per channel (the
    antialiased path that defines clean-fid's scores), -> [B,size,size,3]
    float32 in roughly [0, 1]. Deliberately NOT clipped: bicubic
    overshoots at sharp edges and clean-fid feeds the unclipped floats
    to its extractor."""
    from PIL import Image

    out = np.empty((batch_u8.shape[0], size, size, 3), np.float32)
    for i, img in enumerate(batch_u8):
        for c in range(3):
            ch = Image.fromarray(img[:, :, c].astype(np.float32), mode="F")
            ch = ch.resize((size, size), Image.BICUBIC)
            out[i, :, :, c] = np.asarray(ch, np.float32)
    return out / 255.0


@functools.lru_cache(maxsize=1)
def _cached_extractor(path: str):
    import jax

    # params on device once, passed as jit ARGUMENTS — baking ~95MB of
    # weights in as closure constants bloats the executable and the
    # remote-compile payload (CLAUDE.md benchmark trap 1)
    params = jax.tree.map(jax.device_put, load_params(path))
    fwd = jax.jit(forward)

    def extract(batch_u8: np.ndarray) -> np.ndarray:  # [B, H, W, 3] uint8
        x = clean_resize(batch_u8)
        return np.asarray(fwd(params, x))

    return extract


def jax_inception_extractor():
    """Returns (extract_fn, tag) if a local checkpoint exists, else None."""
    path = default_weights_path()
    if path is None:
        return None
    try:
        return _cached_extractor(path), "inception-jax"
    except Exception as exc:  # unreadable / wrong checkpoint: fall through
        import sys

        print(f"[fid] could not load {path}: {exc}", file=sys.stderr)
        return None
