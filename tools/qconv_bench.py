#!/usr/bin/env python
"""Per-site timing of the fused quantize-conv kernel: v1 (round 3,
serial tiles) vs v2 (round 4, software-pipelined double-buffered Xcat)
vs the plain-XLA oracle of the same math (separate fused-quantize pass
+ int8 conv — what the production turbo tier does).

Methodology matches the round-3 dossier: N invocations per dispatch
via lax.map over per-rep-varied A rows (the tunnel may serve identical
re-executions from cache), value-fetch sync, median of reps.

Prints one JSON line per flagship site class.
Env: INFODIFF_QCB_REPS (default 7), INFODIFF_QCB_INNER (20),
INFODIFF_QCB_SITES (comma-separated site-name filter — resume a run the
tunnel's ~10-min-per-compile pace cut short).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from infodiffusion_tpu.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import jax.random as jr

SITES = [
    ("l0_conv", [(128, 64, 64, 64)], 64),
    ("l1_conv", [(128, 32, 32, 128)], 128),
    ("l2_conv", [(128, 16, 16, 128)], 128),
    ("l0_up_pieces", [(128, 64, 64, 64), (128, 64, 64, 64)], 64),
    ("l1_up_pieces", [(128, 32, 32, 128), (128, 32, 32, 64)], 128),
]


def build(shapes, cout, fn, inner):
    """jit(lambda key: mean over `inner` invocations with per-invocation
    A-row perturbation) — one dispatch, `inner` kernel runs."""
    ps = [0.5 * jr.normal(jr.PRNGKey(i), s, jnp.bfloat16)
          for i, s in enumerate(shapes)]
    ctot = sum(s[-1] for s in shapes)
    B = shapes[0][0]
    A0 = 1.0 + 0.1 * jr.normal(jr.PRNGKey(10), (B, ctot))
    Brow = 0.1 * jr.normal(jr.PRNGKey(11), (B, ctot))
    absmax = jnp.array([1.5] * len(shapes))
    k = 0.2 * jr.normal(jr.PRNGKey(12), (3, 3, ctot, cout))
    b = 0.1 * jr.normal(jr.PRNGKey(13), (cout,))

    def one(key):
        deltas = jr.normal(key, (inner, 1, 1)) * 1e-3

        def body(d):
            return jnp.mean(fn(ps, A0 + d[0], Brow, absmax, k, b))

        return jnp.sum(jax.lax.map(body, deltas))

    return jax.jit(one)


def measure(f, reps):
    # fetch-sync the warmup too, or rep 0 also waits on its execution
    float(f(jr.PRNGKey(99)))  # compile + warm
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(f(jr.fold_in(jr.PRNGKey(7), i)))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def select_sites(sites, only):
    """INFODIFF_QCB_SITES filter: None/empty = all; otherwise the
    comma-separated names, in table order. Unknown names are an error —
    a typo must not silently produce an empty (vacuously "done") run."""
    if not only:
        return list(sites)
    names = {s[0] for s in sites}
    req = [n for n in only.split(",") if n]
    unknown = [n for n in req if n not in names]
    if unknown:
        raise SystemExit(f"unknown site(s) {unknown}; have {sorted(names)}")
    return [s for s in sites if s[0] in req]


def main():
    reps = int(os.environ.get("INFODIFF_QCB_REPS", "7"))
    inner = int(os.environ.get("INFODIFF_QCB_INNER", "20"))

    from infodiffusion_tpu.ops.pallas import qconv as q

    def fused(ps, A, Brow, absmax, k, b):
        return q.qconv_fused(ps, A, Brow, absmax, k, b, jnp.bfloat16)

    def oracle(ps, A, Brow, absmax, k, b):
        return q.qconv_reference(ps, A, Brow, absmax, k, b, jnp.bfloat16)

    sites = select_sites(SITES, os.environ.get("INFODIFF_QCB_SITES"))
    for name, shapes, cout in sites:
        os.environ.pop("INFODIFF_QCONV_V2", None)
        t1 = measure(build(shapes, cout, fused, inner), reps)
        os.environ["INFODIFF_QCONV_V2"] = "1"
        t2 = measure(build(shapes, cout, fused, inner), reps)
        os.environ.pop("INFODIFF_QCONV_V2", None)
        tx = measure(build(shapes, cout, oracle, inner), reps)
        print(json.dumps({
            "site": name,
            "v1_ms": round(t1 / inner * 1e3, 3),
            "v2_ms": round(t2 / inner * 1e3, 3),
            "xla_ms": round(tx / inner * 1e3, 3),
            "v2_vs_v1": round(t1 / t2, 3),
            "v2_vs_xla": round(tx / t2, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
