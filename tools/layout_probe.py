#!/usr/bin/env python
"""Probe XLA's layout assignment for the 128px level-0 tear — and the
round-4 dossier of what the tear actually is (it is NOT what the
round-3 trace note guessed).

MEASURED MECHANICS (this tool, v5e via the axon tunnel, optimized-HLO
reads + fetch-synced timings; full numbers in STATUS.md round 4):

* The real split is CONV vs VPU-WORK, not conv-out vs conv-in: every
  level-0 3x3 convolution consumes AND emits C-minor {3,0,2,1} (the
  im2col emitter wants channels in lanes), while XLA relays the conv
  outputs to W-minor {2,3,1,0} *in scoped memory (VMEM, the S(1)
  copies)* for the GN-stat reduces and the normalize/FiLM/SiLU chains,
  then copies the chain results back to C-minor for the next conv —
  2 copies per conv stage, 2.87 GB/forward at the b32 datapoint
  (36 x ~67 MB on [32,128,128,64] + smaller fry).
* WHY: at W=128 / C=64, W-minor is the COMPACT layout (128 lanes
  exactly) while C-minor half-fills every (8,128) tile — C-minor
  tensors are 2x physical bytes and 2x VPU cycles. The copies buy
  full-lane VPU work running out of VMEM.
* XLA is RIGHT, measured twice: forcing the stats (and thereby the
  chains) to stay C-minor via half-W split reductions
  (INFODIFF_GN_SPLIT_STATS=1, ops/norm.py) removes 70% of copy bytes
  (2872 -> 859 MB) but is a wall-clock WASH on the forward probe
  (143.0 vs 143.3 ms) and 30% SLOWER on the real DDIM-100 bench
  (10.53 vs 14.94 samples/s, b128): the chains lose their VMEM
  staging and pay the 2x C-minor padding on every HBM pass.
  Dot-against-ones stats (INFODIFF_GN_DOT_STATS=1) change nothing
  (XLA canonicalizes them back). Both knobs stay as parity-tested
  negative results.
* The ACTUAL 128px lever was the unfinished batch sweep: rounds 1-3
  recorded 8.66 samples/s at b32 (26% MFU) and never tried b128 —
  which measures 14.94 samples/s (45% MFU = the C_out=64 lane-starved
  conv ceiling; b32/b64 reproduce 8.69/7.82 exactly, so no toolchain
  drift). The copies amortize/hide at full batch.
* The isolated-stack variants below (plain/head/down/skip/full0/tail)
  all compile COPY-FREE — the W-minor preference is a global
  cost-model tip that needs the full model (ch_mult [1,2] is the
  smallest reproducer, byte-identical level-0 copy profile).

This tool reports, from the optimized HLO of either the minimal stack
or the real flagship model: every copy with shape/layout/op
aggregation and total bytes moved, every convolution's result layout,
and (--time) a fetch-synced forward time.

Usage:
  python tools/layout_probe.py                     # minimal stack
  python tools/layout_probe.py --full --chmult 1,2 # smallest reproducer
  python tools/layout_probe.py --full --time       # real model, timed
  INFODIFF_BENCH_SIZE=64 ... --full                # no-tear control
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent compile cache (CLAUDE.md: cold flagship compiles are 6-10
# min through the remote-compile tunnel; this probe's stack is small but
# still benefits)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/infodiff_xla"))

import jax
import jax.numpy as jnp
import jax.random as jr


def build_full_fn(size: int, batch: int, ch_mult=None):
    """The REAL flagship denoiser forward (AuxiliaryUNet via InfoDiff),
    one step's compute — the tear lives in the full graph's layout
    assignment (the minimal stack below compiles copy-free).
    ``ch_mult`` truncates the level pyramid for bisecting (attention is
    dropped when level 2 doesn't exist)."""
    from infodiffusion_tpu.models import InfoDiff

    kw = {}
    if ch_mult is not None:
        kw = {"ch_mult": tuple(ch_mult),
              "attn": (2,) if len(ch_mult) > 2 else ()}
    model = InfoDiff(
        T=1000, a_dim=256, shape=(3, size, size), unets_channels=64,
        encoder_channels=64, mmd_weight=0.1, epochs=50,
        dtype=jnp.bfloat16, **kw,
    )
    x = jnp.zeros((1, size, size, 3))
    t0 = jnp.zeros((1,), jnp.int32)
    a0 = jnp.zeros((1, 256))
    rngs = {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
            "reparam": jr.PRNGKey(2), "dropout": jr.PRNGKey(3)}
    variables = jax.jit(lambda: model.init(rngs, x, t0, a0))()
    xb = jnp.zeros((batch, size, size, 3), jnp.bfloat16)
    tb = jnp.zeros((batch,), jnp.int32)
    ab = jnp.zeros((batch, 256), jnp.bfloat16)
    fwd = jax.jit(lambda v, x, t, a: model.apply(v, x, t, a))
    return fwd, (variables, xb, tb, ab)


def build_fn(size: int, batch: int, ch: int, n_blocks: int,
             variant: str = "plain"):
    """A level-0-shaped stack: n AuxResBlocks (+ optional context that
    the full model has and the bare stack lacks), for bisecting which
    graph feature anchors the W-minor relayouts. Variants:

      plain  — just the blocks (compiles copy-free in isolation)
      head   — a 3->ch head conv in front (the real model's entry)
      down   — Downsample + one ch block at size/2 after the stack
               (the level boundary)
      skip   — block0's output ALSO consumed like a skip piece on the
               up path: piece GN stats + piece conv at the end
      full0  — head + down + skip together (the real level-0 context)
    """
    import flax.linen as nn

    from infodiffusion_tpu.nn.blocks import (
        AuxResBlock,
        Conv3,
        DownSample,
    )

    class Stack(nn.Module):
        dtype: jnp.dtype = jnp.bfloat16

        @nn.compact
        def __call__(self, x, temb, aemb):
            if variant in ("head", "full0", "tail"):
                x = Conv3(ch, self.dtype, quantize=False, name="head")(x)
            skip = None
            for i in range(n_blocks):
                x = AuxResBlock(out_ch=ch, dropout=0.0, attn=False,
                                dtype=self.dtype, name=f"block{i}")(
                    x, temb, aemb, deterministic=True
                )
                if i == 0:
                    skip = x
            if variant in ("down", "full0", "tail"):
                x = DownSample(dtype=self.dtype, name="down")(x)
                x = AuxResBlock(out_ch=ch, dropout=0.0, attn=False,
                                dtype=self.dtype, name="block_lo")(
                    x, temb, aemb, deterministic=True
                )
            if variant in ("skip", "full0", "tail"):
                # an up-path consumer of the skip: joint piece GN stats
                # + piece conv (what the real upblocks do to level-0
                # skips)
                from infodiffusion_tpu.nn.blocks import _PieceConv3
                from infodiffusion_tpu.ops.norm import group_norm_pieces

                h = x
                if variant in ("full0", "tail"):
                    from infodiffusion_tpu.nn.blocks import UpSample

                    h = UpSample(dtype=self.dtype, name="up")(h)
                scale = self.param("gn_scale",
                                   nn.initializers.ones, (2 * ch,),
                                   jnp.float32)
                bias = self.param("gn_bias",
                                  nn.initializers.zeros, (2 * ch,),
                                  jnp.float32)
                ps = group_norm_pieces([h, skip], 32, scale, bias)
                x = _PieceConv3(ch, self.dtype, name="upconv")(
                    [nn.silu(p) for p in ps]
                )
            if variant == "tail":
                # the real model's tail: GN -> SiLU -> 3-ch conv on the
                # final 128px C=64 tensor (absent from every earlier
                # variant — the last untested structural suspect)
                from infodiffusion_tpu.nn.blocks import _GNParams

                h = _GNParams(name="tail_norm")(x)
                x = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name="tail_conv")(
                    nn.silu(h)
                )
            return x

    model = Stack()
    x_ch = 3 if variant in ("head", "full0", "tail") else ch
    x = jnp.zeros((batch, size, size, x_ch), jnp.bfloat16)
    temb = jnp.zeros((batch, 4 * ch), jnp.bfloat16)
    aemb = jnp.zeros((batch, 256), jnp.bfloat16)
    variables = jax.jit(model.init)(
        {"params": jr.PRNGKey(0)}, x, temb, aemb
    )
    fwd = jax.jit(lambda v, x, t, a: model.apply(v, x, t, a))
    return fwd, (variables, x, temb, aemb)


# layouts print as {3,0,2,1:T(8,128)(2,1)S(1)} — dims, then tiling,
# then an optional memory-space tag; capture dims and the S() tag
_SHAPE_RE = re.compile(
    r"(bf16|f32|s8|s32|u8)\[([0-9,]+)\]\{([0-9,]+)([^}]*)\}"
)


def _parse_shapes(line: str):
    return [
        (m.group(1), tuple(int(d) for d in m.group(2).split(",")),
         tuple(int(d) for d in m.group(3).split(","))
         + (("S",) if "S(" in m.group(4) else ()))
        for m in _SHAPE_RE.finditer(line)
    ]


def _nbytes(dtype: str, dims) -> int:
    # must cover every dtype _SHAPE_RE matches (u8: the D21 loader path)
    per = {"bf16": 2, "f32": 4, "s8": 1, "s32": 4, "u8": 1}[dtype]
    n = per
    for d in dims:
        n *= d
    return n


_OPNAME_RE = re.compile(r'op_name="([^"]*)"')


def analyze(hlo: str):
    """Summarize relayout work in optimized HLO text. Copies are
    aggregated by (dims, layout, op tail); convs are listed raw."""
    copies = {}
    convs = []
    for raw in hlo.splitlines():
        line = raw.strip()
        if " = " not in line:
            continue
        head = line.split(" = ")[0].strip()
        if re.search(r"\bcopy\(", line):
            shapes = _parse_shapes(line)
            if not shapes:
                continue
            d, dims, lay = shapes[0]
            m = _OPNAME_RE.search(line)
            tail = ("/".join(m.group(1).split("/")[-2:]) if m else "?")
            key = (dims, lay, tail)
            n, b = copies.get(key, (0, 0))
            copies[key] = (n + 1, b + _nbytes(d, dims))
        elif "convolution(" in line or "convolution-base" in line:
            convs.append(line[:220])
    return copies, convs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--full", action="store_true",
                    help="probe the real flagship UNet forward instead "
                         "of the minimal block stack")
    ap.add_argument("--blocks", type=int, default=2)
    ap.add_argument("--batch", type=int,
                    default=int(os.environ.get("INFODIFF_BENCH_BATCH", 32)))
    ap.add_argument("--size", type=int,
                    default=int(os.environ.get("INFODIFF_BENCH_SIZE", 128)))
    ap.add_argument("--ch", type=int, default=64)
    ap.add_argument("--variant", type=str, default="plain",
                    choices=["plain", "head", "down", "skip", "full0",
                             "tail"])
    ap.add_argument("--chmult", type=str, default="",
                    help="comma list, truncates the full model's level "
                         "pyramid (with --full), e.g. 1 or 1,2")
    ap.add_argument("--no-attn", action="store_true",
                    help="DIAGNOSTIC: replace AttnBlock with identity "
                         "to test whether attention anchors the "
                         "W-minor relayouts")
    ap.add_argument("--dump", type=str, default="",
                    help="write full optimized HLO to this path")
    args = ap.parse_args()

    if args.no_attn:
        import flax.linen as nn

        import infodiffusion_tpu.nn.attention as _attmod

        class _IdAttn(nn.Module):
            dtype: jnp.dtype = jnp.float32

            @nn.compact
            def __call__(self, x):
                return x

        _attmod.AttnBlock = _IdAttn
    if args.full:
        cm = ([int(v) for v in args.chmult.split(",")]
              if args.chmult else None)
        fwd, fargs = build_full_fn(args.size, args.batch, ch_mult=cm)
    else:
        fwd, fargs = build_fn(args.size, args.batch, args.ch, args.blocks,
                              variant=args.variant)
    t0 = time.perf_counter()
    compiled = fwd.lower(*fargs).compile()
    print(f"compiled in {time.perf_counter() - t0:.1f}s "
          f"(backend: {jax.devices()[0].platform})")
    hlo = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(hlo)
        print(f"HLO dumped to {args.dump} ({len(hlo)} chars)")

    copies, convs = analyze(hlo)
    total = sum(b for _, b in copies.values())
    count = sum(n for n, _ in copies.values())
    print(f"\n== {len(convs)} convolutions ==")
    for c in convs:
        print("  " + c)
    print(f"\n== {count} copy instructions, "
          f"{total / 1e6:.1f} MB moved per forward ==")
    rows = sorted(copies.items(), key=lambda kv: -kv[1][1])
    for (dims, lay, tail), (n, nb) in rows[:25]:
        print(f"  {nb / 1e6:8.2f} MB x{n:3d}  {list(dims)} "
              f"layout{list(lay)}  {tail}")

    if args.time:
        out = fwd(*fargs)
        float(jnp.mean(out))  # fetch-sync (CLAUDE.md trap 2)
        reps = 20
        # pre-build the per-rep varied args OUTSIDE the timed window:
        # each eager .at[].set is a ~100ms host round-trip over the
        # tunnel and would otherwise serialize between timed forwards
        varied = [fargs[3].at[0, 0].set(float(i)) for i in range(reps)]
        jax.block_until_ready(varied)
        t0 = time.perf_counter()
        for i in range(reps):
            # vary an arg per rep so the tunnel can't serve a cached
            # execution (CLAUDE.md trap 2)
            out = fwd(fargs[0], fargs[1], fargs[2], varied[i])
        float(jnp.mean(out))
        dt = (time.perf_counter() - t0) / reps
        print(f"\nforward: {dt * 1e3:.2f} ms "
              f"({args.batch / dt:.1f} imgs/s)")


if __name__ == "__main__":
    main()
