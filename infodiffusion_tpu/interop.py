"""PyTorch-checkpoint interop: load the reference's ``torch.save
(model.state_dict())`` checkpoints (reference: run.py:157) into this
framework's Flax models, and export back.

The reference's parameter names follow its module tree (models.py /
modules.py); this maps every one of our param paths to the corresponding
torch key plus a layout transform:

- conv2d kernels  : torch [O, I, kh, kw] -> flax [kh, kw, I, O]
- 1x1 convs       : torch [O, I, 1, 1]   -> flax Dense [I, O]
  (shortcuts + attention projections are Dense here)
- linear kernels  : torch [O, I]         -> flax [I, O]
- norm weights    : weight/bias          -> scale/bias
- TimeEmbedding   : the frozen sinusoid table (timembedding.0.weight) is
  recomputed, not loaded
- Decoder.fc_a    : row-permuted because the reference reshapes its
  output to NCHW (models.py:579) while we reshape to NHWC
- AuxResBlock's dead ``crossattn.*`` params (reference: modules.py:300)
  are ignored on load and omitted on export

Known reference ModuleList orderings are reproduced index-for-index
(down path interleaves DownSample every num_res_blocks blocks; up path
interleaves UpSample every num_res_blocks+1 blocks; models.py:16-46).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import jax
import numpy as np


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def conv_to_flax(w: np.ndarray) -> np.ndarray:
    """[O, I, kh, kw] -> [kh, kw, I, O]."""
    return np.transpose(w, (2, 3, 1, 0))


def conv_from_flax(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (3, 2, 0, 1))


def conv1x1_to_dense(w: np.ndarray) -> np.ndarray:
    """[O, I, 1, 1] -> [I, O]."""
    return np.transpose(w[:, :, 0, 0], (1, 0))


def dense_to_conv1x1(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))[:, :, None, None]


def linear_to_flax(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def decoder_fca_to_flax(w: np.ndarray, b: np.ndarray, shape):
    """Permute output rows CHW -> HWC so our NHWC reshape reproduces the
    torch NCHW reshape (reference: models.py:579)."""
    C, H, W = shape
    perm = np.arange(C * H * W).reshape(C, H, W).transpose(1, 2, 0).reshape(-1)
    return np.transpose(w[perm, :], (1, 0)), b[perm]


def decoder_fca_from_flax(w: np.ndarray, b: np.ndarray, shape):
    C, H, W = shape
    inv = np.arange(C * H * W).reshape(H, W, C).transpose(2, 0, 1).reshape(-1)
    return np.transpose(w, (1, 0))[inv, :], b[inv]


# ---------------------------------------------------------------------------
# path translation
# ---------------------------------------------------------------------------

# EncoderResBlock's conv1/conv2 map to the same block1.2/block2.3 slots,
# so one table covers both block kinds (reference: modules.py:206-366)
_CONV_NAMES = {"conv1": "block1.2", "conv2": "block2.3", "conv3": "block3.3"}
_NORM_NAMES = {"norm1": "block1.0", "norm2": "block2.0", "norm3": "block3.0"}


def _skeleton_index(kind: str, pos: int, levels: int, nrb: int) -> str:
    """Torch ModuleList index for the pos-th block of its kind
    (reference: models.py:16-46)."""
    if kind == "downblock":
        return f"downblocks.{(pos // nrb) * (nrb + 1) + pos % nrb}"
    if kind == "down":
        return f"downblocks.{pos * (nrb + 1) + nrb}"
    if kind == "middleblock":
        return f"middleblocks.{pos}"
    if kind == "upblock":
        return f"upblocks.{(pos // (nrb + 1)) * (nrb + 2) + pos % (nrb + 1)}"
    if kind == "up":
        # up_{i} for level index i; created in order i = L-1 .. 1
        return f"upblocks.{(levels - 1 - pos) * (nrb + 2) + nrb + 1}"
    raise ValueError(kind)


class _SkeletonNamer:
    """Maps our _UNetSkeleton module names (downblock_N / down_i /
    middleblock_N / upblock_N / up_i with one global counter for blocks)
    to torch list indices."""

    def __init__(self, levels: int, nrb: int = 2):
        self.levels = levels
        self.nrb = nrb
        n_down = levels * nrb
        self.first_middle = n_down
        self.first_up = n_down + 2

    def translate(self, name: str) -> str:
        m = re.fullmatch(r"(downblock|middleblock|upblock)_(\d+)", name)
        if m:
            kind, n = m.group(1), int(m.group(2))
            if kind == "downblock":
                pos = n
            elif kind == "middleblock":
                pos = n - self.first_middle
            else:
                pos = n - self.first_up
            return _skeleton_index(kind, pos, self.levels, self.nrb)
        m = re.fullmatch(r"(down|up)_(\d+)", name)
        if m:
            return _skeleton_index(m.group(1), int(m.group(2)), self.levels,
                                   self.nrb)
        if name == "head":
            return "head"
        if name == "tail_norm":
            return "tail.0"
        if name == "tail_conv":
            return "tail.2"
        raise KeyError(name)


def _leaf_spec(path: Tuple[str, ...], namer: _SkeletonNamer,
               bottleneck_fc_a: bool):
    """(torch_key, transform_tag) for one of our param paths *below* a
    UNet-carrying module (backbone/encoder/decoder)."""
    # path like ('unet', 'downblock_0', 'conv1', 'kernel') or
    # ('fc_a', 'kernel') / ('time_embedding', 'dense0', 'kernel')
    p = list(path)
    leaf = p[-1]
    suffix = {"kernel": "weight", "scale": "weight", "weight": "weight",
              "bias": "bias"}[leaf]

    if p[0] == "time_embedding":
        idx = {"dense0": 1, "dense1": 3}[p[1]]
        tag = "linear" if leaf == "kernel" else "none"
        return f"time_embedding.timembedding.{idx}.{suffix}", tag
    if p[0] == "fc_a" and len(p) == 2:
        key = "fc_a.1" if bottleneck_fc_a else "fc_a"
        tag = "linear" if leaf == "kernel" else "none"
        return f"{key}.{suffix}", tag
    if p[0] in ("fc_mu", "fc_var"):
        tag = "linear" if leaf == "kernel" else "none"
        return f"{p[0]}.{suffix}", tag
    if p[0] == "unet":
        mod = namer.translate(p[1])
        rest = p[2:-1]
        if not rest:  # head/tail conv or tail norm, or Down/Up 'conv'
            if p[1] in ("head", "tail_conv"):
                tag = "conv" if leaf == "kernel" else "none"
                return f"{mod}.{suffix}", tag
            if p[1] == "tail_norm":
                return f"{mod}.{suffix}", "none"
            raise KeyError(path)
        if rest == ["conv"]:  # Down/UpSample main conv
            tag = "conv" if leaf == "kernel" else "none"
            return f"{mod}.main.{suffix}", tag
        name = rest[0]
        if name in _CONV_NAMES:
            tag = "conv" if leaf == "kernel" else "none"
            return f"{mod}.{_CONV_NAMES[name]}.{suffix}", tag
        if name in _NORM_NAMES:
            return f"{mod}.{_NORM_NAMES[name]}.{suffix}", "none"
        if name == "temb_proj" or name == "aemb_proj":
            tag = "linear" if leaf == "kernel" else "none"
            return f"{mod}.{name}.1.{suffix}", tag
        if name == "shortcut":
            tag = "conv1x1" if leaf == "kernel" else "none"
            return f"{mod}.shortcut.{suffix}", tag
        if name == "attn":
            sub = rest[1]
            if sub == "group_norm":
                return f"{mod}.attn.group_norm.{suffix}", "none"
            tag = "conv1x1" if leaf == "kernel" else "none"
            return f"{mod}.attn.{sub}.{suffix}", tag
        raise KeyError(path)
    raise KeyError(path)


def _latent_leaf_spec(path):
    p = list(path)
    leaf = p[-1]
    suffix = {"kernel": "weight", "scale": "weight", "bias": "bias"}[leaf]
    m = re.fullmatch(r"time_embed_(\d)", p[0])
    if m:
        idx = int(m.group(1)) * 2  # Sequential: Linear, SiLU, Linear
        tag = "linear" if leaf == "kernel" else "none"
        return f"time_embed.{idx}.{suffix}", tag
    m = re.fullmatch(r"layer_(\d+)", p[0])
    if m:
        i, sub = int(m.group(1)), p[1]
        tag = "linear" if (leaf == "kernel" and sub != "norm") else "none"
        return f"layers.{i}.{sub}.{suffix}", tag
    raise KeyError(path)


def _apply(tag: str, arr: np.ndarray) -> np.ndarray:
    if tag == "none":
        return arr
    if tag == "conv":
        return conv_to_flax(arr)
    if tag == "conv1x1":
        return conv1x1_to_dense(arr)
    if tag == "linear":
        return linear_to_flax(arr)
    raise ValueError(tag)


def _unapply(tag: str, arr: np.ndarray) -> np.ndarray:
    if tag == "none":
        return arr
    if tag == "conv":
        return conv_from_flax(arr)
    if tag == "conv1x1":
        return dense_to_conv1x1(arr)
    if tag == "linear":
        return linear_to_flax(arr)  # transpose is its own inverse op here
    raise ValueError(tag)


def _model_spec(model):
    """Per-top-module (prefix, levels, kind, bottleneck, nrb) table for
    the wrapper. ``nrb`` is the wrapper's num_res_blocks — the skeleton
    flat-index arithmetic (_skeleton_index) depends on it, so it must
    come from the model, not a hardcoded 2."""
    from infodiffusion_tpu.models import Diff, InfoDiff, VAE
    from infodiffusion_tpu.models.wrappers import pick_ch_mult

    nrb = getattr(model, "num_res_blocks", 2)
    if isinstance(model, InfoDiff):
        ch_mult = model.ch_mult or pick_ch_mult("diff", model.shape[1])
        return {
            "backbone": ("backbone.", len(ch_mult), "unet",
                         model.is_bottleneck, nrb),
            "encoder": ("encoder.", len(ch_mult), "unet", False, nrb),
        }
    if isinstance(model, Diff):
        if model.is_latent:
            return {"backbone": ("backbone.", 0, "latent", False, nrb)}
        ch_mult = model.ch_mult or pick_ch_mult("vanilla", model.shape[1])
        return {"backbone": ("backbone.", len(ch_mult), "unet", False, nrb)}
    if isinstance(model, VAE):
        ch_mult = model.ch_mult or pick_ch_mult("vae", model.shape[1])
        return {
            "encoder": ("encoder.", len(ch_mult), "unet", False, nrb),
            "decoder": ("decoder.", len(ch_mult), "unet", False, nrb),
        }
    raise TypeError(type(model))


def param_key_map(model, params) -> Dict[Tuple, Tuple[str, str]]:
    """our param path -> (torch key, transform tag), for every leaf."""
    spec = _model_spec(model)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, _leaf in flat:
        keys = tuple(k.key for k in path)
        top = keys[0]
        prefix, levels, kind, bottleneck, nrb = spec[top]
        sub = keys[1:]
        if kind == "latent":
            tkey, tag = _latent_leaf_spec(sub)
        else:
            namer = _SkeletonNamer(levels, nrb)
            tkey, tag = _leaf_spec(sub, namer, bottleneck)
        out[keys] = (prefix + tkey, tag)
    return out


def load_torch_state_dict(model, params, state_dict: Dict[str, np.ndarray],
                          strict: bool = False):
    """Fill our ``params`` pytree from a reference state_dict (values as
    numpy arrays; use ``load_torch_checkpoint`` for .pth files).

    ``strict=False`` mirrors the reference's eval-time load
    (run.py:233): unused torch keys (e.g. dead crossattn params) are
    ignored. Missing keys always raise."""
    kmap = param_key_map(model, params)

    decoder_shape = None
    if hasattr(model, "shape"):
        decoder_shape = tuple(model.shape)

    used = set()

    def fill(path, leaf):
        keys = tuple(k.key for k in path)
        tkey, tag = kmap[keys]
        if tkey not in state_dict:
            raise KeyError(f"torch checkpoint missing {tkey}")
        used.add(tkey)
        arr = np.asarray(state_dict[tkey])
        # decoder fc_a needs the NCHW->NHWC row permutation
        if keys[0] == "decoder" and keys[1] == "fc_a":
            w, b = decoder_fca_to_flax(
                np.asarray(state_dict[tkey.replace(".bias", ".weight")]),
                np.asarray(state_dict[tkey.replace(".weight", ".bias")]),
                decoder_shape,
            )
            out = w if keys[-1] == "kernel" else b
        else:
            out = _apply(tag, arr)
        if out.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch for {tkey}: {out.shape} vs {leaf.shape}"
            )
        # jnp.array (copy=True), NOT jnp.asarray: on the CPU backend
        # asarray can zero-copy alias the numpy input, and that input is
        # itself a VIEW of the torch tensor's storage (tensor.numpy()
        # shares memory; the transpose transforms also return views) —
        # a later in-place torch mutation (optimizer.step()) would then
        # silently rewrite the "loaded" jax params.
        return jax.numpy.array(out, dtype=leaf.dtype)

    new_params = jax.tree_util.tree_map_with_path(fill, params)
    if strict:
        extra = {
            k for k in state_dict
            if k not in used and "crossattn" not in k
            and "timembedding.0" not in k
        }
        if extra:
            raise KeyError(f"unused torch keys: {sorted(extra)[:8]} ...")
    return new_params


def export_torch_state_dict(model, params) -> Dict[str, np.ndarray]:
    """Our params -> a reference-shaped state_dict (numpy values)."""
    kmap = param_key_map(model, params)
    out = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    pdict = {tuple(k.key for k in path): np.asarray(v) for path, v in flat}
    decoder_shape = tuple(model.shape) if hasattr(model, "shape") else None
    for keys, (tkey, tag) in kmap.items():
        arr = pdict[keys]
        if keys[0] == "decoder" and keys[1] == "fc_a":
            w, b = decoder_fca_from_flax(
                pdict[(keys[0], keys[1], "kernel")],
                pdict[(keys[0], keys[1], "bias")],
                decoder_shape,
            )
            out[tkey] = w if keys[-1] == "kernel" else b
        else:
            out[tkey] = _unapply(tag, arr)
    return out


def load_torch_checkpoint(model, params, path: str, strict: bool = False):
    """Load a reference ``model-{epoch}.pth`` file (requires torch)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    return load_torch_state_dict(model, params, sd, strict=strict)
