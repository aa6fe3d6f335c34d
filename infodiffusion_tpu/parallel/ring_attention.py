"""Sequence parallelism: ring attention over a mesh axis.

SURVEY.md §2.3/§5: the reference's attention runs over image tokens
(<= 256 at the attn level for 64px inputs), so sequence sharding is
never needed at reference scale and is NOT wired into the models. Like
the GPipe executor (parallel/pp.py) it exists as a tested capability of
the parallel toolbox for resolutions beyond the reference's: the exact
``softmax(q k^T / sqrt(C)) v`` of ops/attention.py computed with tokens
sharded over a ``seq`` mesh axis.

The TPU shape of the algorithm: one jitted program; `shard_map` gives
each device its [B, N/S, C] token shard of q/k/v; KV shards rotate
around the ring with `lax.ppermute` (ICI neighbor exchange) while each
device accumulates its query block's output with the numerically-stable
running log-sum-exp (flash-attention accumulation) — no device ever
materializes the full [N, N] logit matrix, and per-device memory is
O(N/S * N/S) per step. Differentiable end-to-end (ppermute transposes),
so it serves training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from infodiffusion_tpu.parallel.pp import shard_map

SEQ_AXIS = "seq"


def make_seq_mesh(n_shards: int, devices=None) -> Mesh:
    from infodiffusion_tpu.parallel.mesh import make_1d_mesh

    return make_1d_mesh(n_shards, SEQ_AXIS, devices)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mesh: Mesh,
    axis: str = SEQ_AXIS,
) -> jnp.ndarray:
    """q, k, v: [B, N, C] (token axis divisible by the mesh axis size)
    -> [B, N, C], equal to ops.attention.single_head_attention up to
    f32 reassociation of the softmax accumulation."""
    S = int(mesh.shape[axis])
    assert q.shape[1] % S == 0, (q.shape, S)
    C = q.shape[-1]
    scale = C ** -0.5

    def body(q, k, v):
        qf = q.astype(jnp.float32)
        B, n, _ = q.shape
        perm = [(i, (i + 1) % S) for i in range(S)]

        def accumulate(carry, kc, vc):
            m, l, o = carry
            logits = (
                jnp.einsum(
                    "bnc,bmc->bnm", qf, kc.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            m_new = jnp.maximum(m, logits.max(-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(logits - m_new)
            l = l * alpha + p.sum(-1, keepdims=True)
            o = o * alpha + jnp.einsum(
                "bnm,bmc->bnc", p, vc.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            return m_new, l, o

        def step(carry, _):
            # rotate FIRST, then accumulate: the local block is handled
            # before the loop, so only the necessary S-1 ring exchanges
            # are issued (no discarded final ppermute pair)
            m, l, o, kc, vc = carry
            kc = lax.ppermute(kc, axis, perm)
            vc = lax.ppermute(vc, axis, perm)
            m, l, o = accumulate((m, l, o), kc, vc)
            return (m, l, o, kc, vc), None

        m0 = jnp.full((B, n, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((B, n, 1), jnp.float32)
        o0 = jnp.zeros((B, n, C), jnp.float32)
        carry0 = accumulate((m0, l0, o0), k, v)  # own (local) KV block
        (m, l, o, _, _), _ = lax.scan(
            step, carry0 + (k, v), None, length=S - 1
        )
        return (o / l).astype(v.dtype)

    # Pin the op boundary to REPLICATED on this mesh. Under --sp the
    # surrounding model is replicated (the 'seq' mesh owns all devices),
    # but without explicit constraints GSPMD propagates the shard_map's
    # token sharding into the enclosing fwd+bwd graph — and on the
    # deepest-level attention configs that propagation produced a
    # SILENTLY WRONG cotangent accumulation (an `add_any` under
    # "involuntary full rematerialization", XLA b/433785288): the UNet
    # tail conv's weight grad came out exactly 2x. Caught by the
    # dryrun_multichip SP train-step gradient check (round 3); guarded
    # by test_sp.py::test_sp_grads_deep_attention_level.
    from jax.sharding import NamedSharding

    repl = NamedSharding(mesh, P())
    q, k, v = (
        jax.lax.with_sharding_constraint(t, repl) for t in (q, k, v)
    )
    out = shard_map(
        body, mesh,
        in_specs=(P(None, axis, None),) * 3,
        out_specs=P(None, axis, None),
        check_rep=False,
    )(q, k, v)
    return jax.lax.with_sharding_constraint(out, repl)
