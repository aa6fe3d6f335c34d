#!/usr/bin/env python
"""Offline validation of a candidate pt_inception FID weights file.

The environment has no network egress, so the canonical pytorch-fid
checkpoint (``pt_inception-2015-12-05-6726825d.pth`` — the network
behind every published FID number; the reference scores through the
same TF-Inception port via clean-fid, /root/reference/calc_fid.py:6-14)
cannot be downloaded here. This tool makes real-weights day provably
turn-key: point it at a candidate ``.pth`` and it verifies, entirely
offline,

1. **identity** — SHA-256 of the file; the canonical release's digest
   starts with ``6726825d`` (torch.hub filename convention), so a
   prefix match identifies the exact release file and a mismatch means
   "schema may still be fine, but this is not the canonical bytes";
2. **schema** — every tensor :func:`fold_state_dict` consumes exists
   with the exact expected shape (metrics/inception.py
   ``expected_state_dict_schema``), so loading cannot KeyError or
   silently broadcast;
3. **load + forward** — the BN-fold runs, the jitted JAX forward maps a
   deterministic test batch to finite FEATURE_DIM features.

Prints one JSON verdict line; exit code 0 iff the file is usable
(schema + forward OK — identity mismatch alone is a warning, since a
re-saved copy of the same tensors scores identically).

Usage:  python tools/verify_inception_weights.py /path/to/weights.pth
        python tools/verify_inception_weights.py   # $INFODIFF_INCEPTION_WEIGHTS
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def verify(path: str, forward: bool = True) -> dict:
    from infodiffusion_tpu.metrics import inception as inc

    verdict = {
        "path": path,
        "canonical_filename": inc.CANONICAL_WEIGHTS_FILENAME,
        "sha256": None,
        "canonical_identity": False,
        "schema_ok": False,
        "forward_ok": None,
        "problems": [],
        "usable": False,
    }
    if not os.path.exists(path):
        verdict["problems"].append(f"file does not exist: {path}")
        return verdict

    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    digest = h.hexdigest()
    verdict["sha256"] = digest
    verdict["canonical_identity"] = digest.startswith(
        inc.CANONICAL_SHA256_PREFIX
    )
    if not verdict["canonical_identity"]:
        verdict["problems"].append(
            f"warning: sha256 {digest[:8]}... does not start with "
            f"{inc.CANONICAL_SHA256_PREFIX} — not the canonical release "
            "bytes (a re-saved state_dict of the same tensors is still "
            "usable; scores are only citable as pytorch-fid-exact if the "
            "tensors match the release)"
        )

    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:  # pragma: no cover - torch message passthrough
        verdict["problems"].append(f"torch.load failed: {e}")
        return verdict
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    sd = {k: v for k, v in obj.items() if hasattr(v, "numpy")}
    ok, problems = inc.verify_state_dict_schema(
        {k: v.numpy() for k, v in sd.items()}
    )
    verdict["schema_ok"] = ok
    verdict["problems"].extend(problems)
    if not ok:
        return verdict

    if forward:
        import jax.numpy as jnp
        import numpy as np

        params = inc.load_params(path)
        rng = np.random.RandomState(0)
        x = jnp.asarray(
            rng.uniform(0, 1, (2, inc.INPUT_SIZE, inc.INPUT_SIZE, 3)),
            jnp.float32,
        )
        feats = np.asarray(inc.forward(params, x))
        fwd_ok = feats.shape == (2, inc.FEATURE_DIM) and bool(
            np.isfinite(feats).all()
        )
        verdict["forward_ok"] = fwd_ok
        if not fwd_ok:
            verdict["problems"].append(
                f"forward produced shape {feats.shape}, "
                f"finite={bool(np.isfinite(feats).all())}"
            )
    verdict["usable"] = verdict["schema_ok"] and verdict["forward_ok"] in (
        True, None,
    )
    return verdict


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv:
        path = argv[0]
    else:
        path = os.environ.get("INFODIFF_INCEPTION_WEIGHTS", "")
        if not path:
            print(
                "usage: verify_inception_weights.py <weights.pth> "
                "(or set INFODIFF_INCEPTION_WEIGHTS)",
                file=sys.stderr,
            )
            return 2
    verdict = verify(path)
    print(json.dumps(verdict))
    return 0 if verdict["usable"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
