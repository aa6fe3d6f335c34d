"""FSDP/ZeRO-style parameter + optimizer-state sharding.

Beyond plain data parallelism (params replicated), this places each
large parameter sharded along the mesh's 'data' axis: under GSPMD the
jitted train step all-gathers weights where used and reduce-scatters
gradients — per-chip memory for params and Adam moments drops by ~the
mesh size while the math stays identical to the replicated step
(equivalence tested on the virtual CPU mesh).

The reference is single-GPU (SURVEY.md §2.3); this is a new scaling
capability — optional for the 35M-param flagship, the switch that
matters for larger derivatives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from infodiffusion_tpu.parallel.mesh import DATA_AXIS


def fsdp_param_sharding(mesh: Mesh, params, min_size: int = 2 ** 14):
    """NamedSharding pytree: each array sharded on its largest
    data-axis-divisible dimension; small arrays stay replicated
    (sharding tiny biases costs more in collective latency than it
    saves)."""
    n = mesh.shape[DATA_AXIS]

    def spec(x):
        if x.ndim == 0 or x.size < min_size:
            return NamedSharding(mesh, P())
        for d in sorted(range(x.ndim), key=lambda d: -x.shape[d]):
            if x.shape[d] % n == 0:
                axes = [None] * x.ndim
                axes[d] = DATA_AXIS
                return NamedSharding(mesh, P(*axes))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, params)


def place_state(mesh: Mesh, state, psharding):
    """Place a TrainState per ``psharding`` (a NamedSharding pytree
    mirroring params): params, param-shaped optimizer subtrees (Adam
    mu/nu) and EMA get the param shardings; everything else replicated.

    Param-shaped subtrees inside the optax state are recognized by tree
    structure, so this works for any optimizer chain whose stats mirror
    the param tree."""
    repl = NamedSharding(mesh, P())
    pdef = jax.tree_util.tree_structure(state.params)

    def place_param_tree(tree):
        return jax.tree.map(lambda x, s: jax.device_put(x, s), tree,
                            psharding)

    def is_param_tree(x):
        try:
            return jax.tree_util.tree_structure(x) == pdef
        except Exception:
            return False

    def place_opt(sub):
        if is_param_tree(sub):
            return place_param_tree(sub)
        return jax.device_put(sub, repl)

    opt_state = jax.tree.map(place_opt, state.opt_state,
                             is_leaf=is_param_tree)
    ema = (
        place_param_tree(state.ema_params)
        if state.ema_params is not None else None
    )
    return state.replace(
        params=place_param_tree(state.params),
        opt_state=opt_state,
        ema_params=ema,
        step=jax.device_put(state.step, repl),
        rng=jax.device_put(state.rng, repl),
    )


def shard_state_fsdp(mesh: Mesh, state, min_size: int = 2 ** 14):
    """FSDP/ZeRO placement: large params (+ mirrored optimizer stats and
    EMA) sharded over the 'data' axis."""
    return place_state(
        mesh, state, fsdp_param_sharding(mesh, state.params, min_size)
    )
