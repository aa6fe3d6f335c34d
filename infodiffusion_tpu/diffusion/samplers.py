"""Whole-trajectory samplers as single ``lax.scan`` programs.

The reference drives every trajectory from Python — T=1000 host-side
steps, each one a separate CUDA launch + generator ``yield``
(reference: sampling.py:23-101). Here a full trajectory is ONE jitted
XLA program: the scan body does eps-prediction + the update algebra
entirely on device, so sampling has zero host round-trips — the single
biggest TPU win identified in SURVEY.md §3.2.

Sampler families (API parity with reference classes):

- ``sample_loop``          : DDPM ancestral / stochastic DDIM (eta=0.01)
                             over the full T grid (sampling.py:23-60).
- ``reverse_sample_loop``  : deterministic forward DDIM encoding x0->xT
                             (sampling.py:62-73).
- ``two_phase_sample_loop``: conditional/unconditional model switch at
                             ``split_step`` (sampling.py:104-204). The
                             reference's loop binds its phase counter
                             once, so its phase-2 model runs the whole
                             trajectory (sampling.py:199-203) — that
                             quirk is available behind
                             ``reference_quirk=True``; default is the
                             *intended* split semantics.
- ``strided_ddim_loop``    : DDIM-N on a subsampled grid — a new fast
                             path the reference lacks (it always walks
                             all T steps).

Conventions: ``eps_fn(x, t, a)`` / ``eps_fn2(x, t)`` are closures over
model params (callers jit the whole loop with params as an argument);
``t`` is an int32 [B] array.
"""

from __future__ import annotations

import warnings
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import jax.random as jr
from jax import lax

from infodiffusion_tpu.diffusion.schedule import (
    DEFAULT_ETA,
    Schedule,
    ddim_reverse_step,
    ddim_step,
    ddpm_step,
    strided_ddim_step,
)


def _full_t(x: jnp.ndarray, idx) -> jnp.ndarray:
    return jnp.full((x.shape[0],), idx, dtype=jnp.int32)


def sample_loop(
    eps_fn: Callable,
    sched: Schedule,
    xT: jnp.ndarray,
    key: jax.Array,
    a: Optional[jnp.ndarray] = None,
    *,
    deterministic: bool = False,
    eta: float = DEFAULT_ETA,
    noises: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full-grid reverse diffusion (reference: sampling.py:23-60,89-101).

    ``deterministic=True`` selects the stochastic-DDIM (eta=0.01) branch
    like the reference's ``--deterministic`` flag; otherwise DDPM.

    ``noises`` optionally injects the per-step Gaussian draws — shape
    [T, *xT.shape], ordered like the scan (noises[i] is used at timestep
    idx = T-1-i; the idx==0 entry is ignored where the update rule zeroes
    the noise). Cross-implementation parity tests force the reference's
    torch draws through this; normal runs draw inside the jitted scan."""
    idxs = jnp.arange(sched.T - 1, -1, -1)

    def step(x, idx, noise):
        eps = eps_fn(x, _full_t(x, idx), a)
        if deterministic:
            return ddim_step(sched, x, idx, eps, noise, eta=eta)
        noise = jnp.where(idx == 0, jnp.zeros_like(noise), noise)
        return ddpm_step(sched, x, idx, eps, noise)

    if noises is None:
        def body(carry, idx):
            x, key = carry
            key, k = jr.split(key)
            noise = jr.normal(k, x.shape, dtype=x.dtype)
            return (step(x, idx, noise), key), None

        (x, _), _ = lax.scan(body, (xT, key), idxs)
        return x

    def body_inj(x, scan_in):
        idx, noise = scan_in
        return step(x, idx, noise), None

    x, _ = lax.scan(body_inj, xT, (idxs, noises))
    return x


def reverse_sample_loop(
    eps_fn: Callable,
    sched: Schedule,
    x0: jnp.ndarray,
    a: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Deterministic DDIM encoding x0 -> xT (reference: sampling.py:62-73):
    iterates idx = 0..T-2 with a no-op at idx 0 (so the scan starts at 1)."""
    idxs = jnp.arange(1, sched.T - 1)

    def body(x, idx):
        eps = eps_fn(x, _full_t(x, idx), a)
        return ddim_reverse_step(sched, x, idx, eps), None

    x, _ = lax.scan(body, x0, idxs)
    return x


def two_phase_sample_loop(
    eps_fn_cond: Callable,
    eps_fn_uncond: Callable,
    sched: Schedule,
    xT: jnp.ndarray,
    key: jax.Array,
    a: jnp.ndarray,
    split_step: int,
    *,
    deterministic: bool = False,
    eta: float = DEFAULT_ETA,
    reference_quirk: bool = False,
    noises: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Two-phase sampling (reference: sampling.py:104-204).

    Phase counter ``n`` counts completed steps from xT; steps with
    ``n <= split_step`` (the high-noise phase) use the unconditional
    model, the rest the conditional one (sampling.py:136-139,153-156).
    ``reference_quirk=True`` reproduces the reference's dead branch where
    the counter never advances (sampling.py:199-203). ``noises`` injects
    the per-step Gaussian draws like ``sample_loop``'s."""
    idxs = jnp.arange(sched.T - 1, -1, -1)
    steps = jnp.arange(sched.T)  # n = 0, 1, ... alongside descending idx

    def eps_and_step(x, idx, n, noise):
        t = _full_t(x, idx)
        if reference_quirk:
            eps = eps_fn_uncond(x, t)
        else:
            eps = lax.cond(
                n <= split_step,
                lambda x_t: eps_fn_uncond(x_t[0], x_t[1]),
                lambda x_t: eps_fn_cond(x_t[0], x_t[1], a),
                (x, t),
            )
        if deterministic:
            return ddim_step(sched, x, idx, eps, noise, eta=eta)
        noise = jnp.where(idx == 0, jnp.zeros_like(noise), noise)
        return ddpm_step(sched, x, idx, eps, noise)

    if noises is None:
        def body(carry, scan_in):
            idx, n = scan_in
            x, key = carry
            key, k = jr.split(key)
            noise = jr.normal(k, x.shape, dtype=x.dtype)
            return (eps_and_step(x, idx, n, noise), key), None

        (x, _), _ = lax.scan(body, (xT, key), (idxs, steps))
        return x

    def body_inj(x, scan_in):
        idx, n, noise = scan_in
        return eps_and_step(x, idx, n, noise), None

    x, _ = lax.scan(body_inj, xT, (idxs, steps, noises))
    return x


def strided_ddim_loop(
    eps_fn: Callable,
    sched: Schedule,
    xT: jnp.ndarray,
    key: jax.Array,
    a: Optional[jnp.ndarray] = None,
    *,
    num_steps: int = 100,
    eta: float = 0.0,
) -> jnp.ndarray:
    """Fast DDIM-N over a subsampled timestep grid (new capability; the
    reference always iterates all T steps — SURVEY.md §C11). Grid is the
    standard even spacing 0..T-1 in ``num_steps`` points, walked from
    high noise to t_prev=-1 (exact landing on x0)."""
    ts = jnp.linspace(0, sched.T - 1, num_steps).round().astype(jnp.int32)[::-1]
    ts_prev = jnp.concatenate([ts[1:], jnp.array([-1], jnp.int32)])

    def body(carry, scan_in):
        t, t_prev = scan_in
        x, key = carry
        eps = eps_fn(x, _full_t(x, t), a)
        if eta == 0.0:
            # deterministic path: sigma == 0, skip the RNG work entirely
            noise = jnp.zeros_like(x)
        else:
            key, k = jr.split(key)
            noise = jr.normal(k, x.shape, dtype=x.dtype)
            noise = jnp.where(t_prev < 0, jnp.zeros_like(noise), noise)
        x = strided_ddim_step(sched, x, t, t_prev, eps, noise, eta=eta)
        return (x, key), None

    (x, _), _ = lax.scan(body, (xT, key), (ts, ts_prev))
    return x


# ---------------------------------------------------------------------------
# Class wrappers with the reference's DiffusionProcess API surface
# (construction from a model + params; .sampling / .reverse_sampling).
# Each caches one jitted end-to-end trajectory program per shape.
# ---------------------------------------------------------------------------


def _mesh_will_shard(mesh, batch_arrays, warn=False):
    """Whether _shard_for_mesh will actually shard (mesh has a 'data'
    axis and every batch divides it). Also the key for the trace-time
    kernel gate: the mesh_compute_scope must track what the TRACE sees
    — scoping on the mesh object alone would disable the default-ON
    flash kernel even when the fallback runs a plain single-placement
    program (round-5 review finding)."""
    if mesh is None or "data" not in mesh.shape:
        # meshes without a 'data' axis (e.g. the 1-D 'seq'/'stage'
        # meshes) have nothing to shard batches over — fall back rather
        # than build a PartitionSpec on a nonexistent axis
        return False
    n = int(mesh.shape.get("data", 1))
    sizes = [a.shape[0] for a in batch_arrays if a is not None]
    if not sizes or any(s % n for s in sizes):
        if warn and n > 1 and sizes:
            warnings.warn(
                f"sampling batch sizes {sorted(set(sizes))} do not divide "
                f"the {n}-way 'data' mesh axis; falling back to "
                "single-device eval sampling (pad or resize the batch to "
                f"a multiple of {n} to shard it)",
                stacklevel=4,
            )
        return False
    return True


def _spans_devices(x) -> bool:
    """True when ``x`` is a jax.Array laid out across >1 device (the
    given-input entry points gate the default-ON kernels on this)."""
    try:
        return len(x.devices()) > 1
    except Exception:  # numpy / tracer / older jax: single-placement
        return False


def _shard_for_mesh(mesh, params, batch_arrays):
    """Shard sampling batches over the mesh's data axis and replicate
    params; no-op when mesh is None or the batch doesn't divide the
    axis. Eval-time batch parallelism the reference (single-GPU) lacks."""
    if not _mesh_will_shard(mesh, batch_arrays, warn=True):
        return params, batch_arrays
    from jax.sharding import NamedSharding, PartitionSpec as P

    # batches shard over the 'data' axis only (the 'model' axis, when
    # >1, carries tensor-parallel weight shards — not batch shards)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    params = jax.device_put(params, repl)
    batch_arrays = [
        jax.device_put(a, data) if a is not None else None
        for a in batch_arrays
    ]
    return params, batch_arrays


def _requirk_eps_fn(model, params, key, r_seed):
    """eps_fn reproducing the reference's reverse_sampling bug
    (--reverse_reference_quirk, PARITY.md D13): every reverse-sampling
    wrapper in the reference drops `a` (sampling.py:84-87 and the
    two-phase one at sampling.py:183-188), so InfoDiff.forward
    re-encodes the CURRENT noisy sample at every step
    (models.py:708-710) — conditioning drifts with the trajectory. The
    a_q reparam draw needs a key (torch global RNG in the reference);
    when none is given it derives one from r_seed INSIDE the jitted
    trajectory (sampler entry points stay free of eager device ops)."""
    mdl_cls = type(model)

    def eps_fn(x, t, _a):
        k = key if key is not None else jr.PRNGKey(r_seed)
        a_det, a_q, _mu, _lv = model.apply(
            params, x, method=mdl_cls.encode,
            rngs={"reparam": jr.fold_in(k, t[0])}, sample=True,
        )
        cond = model._route_latent(a_det, a_q)
        return model.apply(params, x, t, cond)

    return eps_fn


def _resolve_turbo(cfg, turbo):
    """Explicit arg > cfg.turbo > INFODIFF_TURBO env.

    '' means "unset, fall through"; 'off' is an EXPLICIT off that stops
    the fallthrough — the only way to defeat an exported INFODIFF_TURBO
    from the CLI (--turbo off)."""
    from infodiffusion_tpu.ops.quant import turbo_mode

    mode = turbo if turbo is not None else (
        getattr(cfg, "turbo", "") or turbo_mode()
    )
    from infodiffusion_tpu.ops.quant import MODES

    if mode == "off":
        return ""
    if mode not in ("",) + MODES:
        raise ValueError(
            f"unknown turbo mode {mode!r} (expected '', 'off' or "
            f"one of {MODES})"
        )
    return mode


class DiffusionProcess:
    """API-parity wrapper (reference: sampling.py:3-101).

    ``model`` is an InfoDiff/Diff Flax module; ``params`` its variables.
    ``sampling`` draws xT ~ N(0, I) (and a ~ N(0, I_a) for conditional
    models) when not given, like the reference (sampling.py:89-101).
    ``mesh``: optional data mesh — sampling batches shard over it.
    ``turbo='int8'`` (or --turbo int8 / INFODIFF_TURBO=int8) calibrates
    activation scales once at construction and runs the UNet conv tier
    W8A8 on the MXU (ops/quant.py) — a beyond-reference inference mode.
    """

    def __init__(self, cfg, model, params, shape=None, mesh=None,
                 turbo=None):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.mesh = mesh
        # shape in reference (C, H, W) convention -> NHWC here
        c, h, w = shape if shape is not None else cfg.shape
        self.data_shape = (h, w, c)
        self.is_conditional = cfg.model != "vanilla"
        self.turbo = _resolve_turbo(cfg, turbo)
        if self.turbo:
            from infodiffusion_tpu.ops.quant import calibrate

            # adds the 'quant' collection; every jitted trajectory below
            # sees the new pytree structure and traces the int8 path
            self.params = calibrate(
                model, self.params, self.data_shape,
                a_dim=cfg.a_dim if self.is_conditional else None,
                T=cfg.diffusion_steps, mode=self.turbo,
            )
        from infodiffusion_tpu.diffusion.schedule import make_schedule

        self.sched = make_schedule(cfg.beta1, cfg.betaT, cfg.diffusion_steps)
        self._jit_sample = jax.jit(self._sample_impl)
        self._jit_reverse = jax.jit(self._reverse_impl)
        self._jit_strided = jax.jit(
            self._strided_impl, static_argnames=("num_steps",)
        )
        self._jit_sample_draw = jax.jit(
            self._sample_draw_impl, static_argnames=("n", "num_steps")
        )
        self._jit_sample_given = jax.jit(
            self._sample_given_impl, static_argnames=("num_steps",)
        )

    def _eps_fn(self, params):
        if self.is_conditional:
            return lambda x, t, a: self.model.apply(params, x, t, a)
        return lambda x, t, a: self.model.apply(params, x, t)

    def _sample_draw_impl(self, params, key, a, n, num_steps):
        # xT/a drawn INSIDE the jitted program: under a remote-dispatch
        # TPU tunnel every eager op is a host round-trip (~100ms each),
        # which dominated the latent sampler's ~96ms trajectory.
        k_x, k_a, k_s = jr.split(key, 3)
        xT = jr.normal(k_x, (n,) + self.data_shape)
        if self.is_conditional and a is None:
            a = jr.normal(k_a, (n, self.cfg.a_dim))
        if num_steps is not None:
            return self._strided_impl(params, xT, a, k_s, num_steps)
        return self._sample_impl(params, xT, a, k_s)

    def _sample_given_impl(self, params, key, xT, a, num_steps):
        # xT given by the caller but the key math still runs INSIDE the
        # jitted program (CLAUDE.md: sampler entry points stay free of
        # eager device ops — disentangle alone calls this a_dim times).
        # Split mirrors the mesh path exactly, so values are unchanged.
        _k_x, k_a, k_s = jr.split(key, 3)
        if self.is_conditional and a is None:
            a = jr.normal(k_a, (xT.shape[0], self.cfg.a_dim))
        if num_steps is not None:
            return self._strided_impl(params, xT, a, k_s, num_steps)
        return self._sample_impl(params, xT, a, k_s)

    def _sample_impl(self, params, xT, a, key):
        return sample_loop(
            self._eps_fn(params), self.sched, xT, key, a,
            deterministic=self.cfg.deterministic,
        )

    def _reverse_impl(self, params, x0, a, key=None):
        eps_fn = self._eps_fn(params)
        if (
            getattr(self.cfg, "reverse_reference_quirk", False)
            and self.is_conditional
        ):
            eps_fn = _requirk_eps_fn(
                self.model, params, key, self.cfg.r_seed
            )
        return reverse_sample_loop(eps_fn, self.sched, x0, a)

    def _strided_impl(self, params, xT, a, key, num_steps):
        return strided_ddim_loop(
            self._eps_fn(params), self.sched, xT, key, a, num_steps=num_steps
        )

    def sampling(self, key, sampling_number=16, xT=None, a=None, num_steps=None):
        if num_steps is None:
            num_steps = self.cfg.sampling_steps
        if self.mesh is None:
            if xT is None:
                return self._jit_sample_draw(
                    self.params, key, a, n=sampling_number,
                    num_steps=num_steps,
                )
            return self._jit_sample_given(
                self.params, key, xT, a, num_steps=num_steps
            )
        # mesh path: sharding needs concrete arrays up front, so the
        # draws stay eager here (sharded eval is host-driven anyway)
        k_x, k_a, k_s = jr.split(key, 3)
        if xT is None:
            xT = jr.normal(k_x, (sampling_number,) + self.data_shape)
        if self.is_conditional and a is None:
            a = jr.normal(k_a, (xT.shape[0], self.cfg.a_dim))
        # trace-time kernel gate: default-ON pallas kernels fall back to
        # the GSPMD-partitioned XLA paths when the trace is actually
        # sharded (scope None on the indivisible-batch fallback, whose
        # program is plain single-placement)
        from infodiffusion_tpu.ops.gating import mesh_compute_scope

        scope = self.mesh if _mesh_will_shard(self.mesh, [xT, a]) else None
        params, (xT, a) = _shard_for_mesh(self.mesh, self.params, [xT, a])
        with mesh_compute_scope(scope):
            if num_steps is not None:
                return self._jit_strided(
                    params, xT, a, k_s, num_steps=num_steps
                )
            return self._jit_sample(params, xT, a, k_s)

    def reverse_sampling(self, x0, a=None, key=None):
        # callers may hand in mesh-sharded x0 (e.g. reusing a sharded
        # sampling output) — gate the default-ON kernels exactly like
        # the forward path (round-5 review finding); keyed on x0's
        # actual device span, since this entry point never shards
        # anything itself
        from infodiffusion_tpu.ops.gating import mesh_compute_scope

        scope = self.mesh if _spans_devices(x0) else None
        with mesh_compute_scope(scope):
            return self._jit_reverse(self.params, x0, a, key)


class TwoPhaseDiffusionProcess:
    """API-parity wrapper (reference: sampling.py:104-204). fn_1 is the
    conditional InfoDiff, fn_2 the unconditional vanilla Diff."""

    def __init__(self, cfg, model1, params1, model2, params2, shape=None,
                 mesh=None, turbo=None):
        self.cfg = cfg
        self.mesh = mesh
        self.model1, self.params1 = model1, params1
        self.model2, self.params2 = model2, params2
        c, h, w = shape if shape is not None else cfg.shape
        self.data_shape = (h, w, c)
        self.turbo = _resolve_turbo(cfg, turbo)
        if self.turbo:
            from infodiffusion_tpu.ops.quant import calibrate

            self.params1 = calibrate(
                model1, params1, self.data_shape, a_dim=cfg.a_dim,
                T=cfg.diffusion_steps, mode=self.turbo,
            )
            self.params2 = calibrate(
                model2, params2, self.data_shape, a_dim=None,
                T=cfg.diffusion_steps, mode=self.turbo,
            )
        from infodiffusion_tpu.diffusion.schedule import make_schedule

        self.sched = make_schedule(cfg.beta1, cfg.betaT, cfg.diffusion_steps)
        self._jit_sample = jax.jit(self._sample_impl)
        self._jit_reverse = jax.jit(self._reverse_impl)
        self._jit_sample_draw = jax.jit(
            self._sample_draw_impl, static_argnames=("n",)
        )
        self._jit_sample_given = jax.jit(self._sample_given_impl)

    def _sample_impl(self, params1, params2, xT, a, key):
        cond = lambda x, t, a_: self.model1.apply(params1, x, t, a_)
        uncond = lambda x, t: self.model2.apply(params2, x, t)
        return two_phase_sample_loop(
            cond, uncond, self.sched, xT, key, a, self.cfg.split_step,
            deterministic=self.cfg.deterministic,
            reference_quirk=self.cfg.two_phase_reference_quirk,
        )

    def _sample_draw_impl(self, params1, params2, key, a, n):
        k_x, k_a, k_s = jr.split(key, 3)
        xT = jr.normal(k_x, (n,) + self.data_shape)
        if a is None:
            a = jr.normal(k_a, (n, self.cfg.a_dim))
        return self._sample_impl(params1, params2, xT, a, k_s)

    def _sample_given_impl(self, params1, params2, key, xT, a):
        # key math inside the jit (see DiffusionProcess._sample_given_impl)
        _k_x, k_a, k_s = jr.split(key, 3)
        if a is None:
            a = jr.normal(k_a, (xT.shape[0], self.cfg.a_dim))
        return self._sample_impl(params1, params2, xT, a, k_s)

    def _reverse_impl(self, params1, x0, a, key=None):
        cond = lambda x, t, a_: self.model1.apply(params1, x, t, a_)
        if getattr(self.cfg, "reverse_reference_quirk", False):
            # same reference bug at the two-phase site (sampling.py:183-188)
            cond = _requirk_eps_fn(self.model1, params1, key, self.cfg.r_seed)
        return reverse_sample_loop(cond, self.sched, x0, a)

    def sampling(self, key, sampling_number=16, xT=None, a=None):
        if self.mesh is None:
            if xT is None:
                return self._jit_sample_draw(
                    self.params1, self.params2, key, a, n=sampling_number
                )
            return self._jit_sample_given(
                self.params1, self.params2, key, xT, a
            )
        k_x, k_a, k_s = jr.split(key, 3)
        if xT is None:
            xT = jr.normal(k_x, (sampling_number,) + self.data_shape)
        if a is None:
            a = jr.normal(k_a, (xT.shape[0], self.cfg.a_dim))
        from infodiffusion_tpu.ops.gating import mesh_compute_scope

        scope = self.mesh if _mesh_will_shard(self.mesh, [xT, a]) else None
        params1, (xT, a) = _shard_for_mesh(self.mesh, self.params1, [xT, a])
        params2, _ = _shard_for_mesh(self.mesh, self.params2, [xT])
        with mesh_compute_scope(scope):
            return self._jit_sample(params1, params2, xT, a, k_s)

    def reverse_sampling(self, x0, a=None, key=None):
        # same device-span kernel gate as DiffusionProcess.reverse_sampling
        from infodiffusion_tpu.ops.gating import mesh_compute_scope

        scope = self.mesh if _spans_devices(x0) else None
        with mesh_compute_scope(scope):
            return self._jit_reverse(self.params1, x0, a, key)


class LatentDiffusionProcess:
    """Sampler over the a_dim latent space with the trained LatentUNet
    (reference: sampling.py:207-292).

    On TPU the whole trajectory runs as ONE Pallas kernel by default
    (ops/pallas/latent_traj.py: the T-step loop, weight streaming,
    per-step FiLM rows and noise all live inside a single pallas_call —
    measured FASTER than the XLA scan, the numbers live in that module
    and STATUS.md). INFODIFF_DISABLE_FUSED_LATENT_TRAJ=1 (or the
    INFODIFF_DISABLE_PALLAS umbrella) reverts to the XLA scan.
    INFODIFF_ENABLE_FUSED_LATENT=1 selects the older per-forward fused
    kernel instead (latent_mlp.py; ~10% behind XLA, kept as a measured
    alternative).

    ``--turbo int8`` (or INFODIFF_TURBO=int8) quantizes the trajectory
    kernel's WEIGHT STREAM to int8 (ops/pallas/latent_traj.py
    quantize_packed_weights); the matmuls stay bf16 on the MXU.
    MEASURED NEUTRAL (round 4, tools/latent_turbo_bench.py,
    kernel-level, 15 reps with per-rep keys: 1.003-1.013x at a_dim
    32/64/256, every delta inside the middle-half spread) — the
    double-buffered weight DMA was already fully hidden behind compute,
    so halving its bytes changes nothing. Kept wired so the tier's
    semantics stay uniform across legs (conv bodies + encoder + latent),
    not as a performance claim. Latent turbo requires the trajectory
    kernel — on the XLA-scan fallback paths (mesh, kernel disabled,
    unsupported shapes) the latent leg stays bf16 and a warning says
    so."""

    def __init__(self, cfg, model, params, mesh=None, turbo=None):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.mesh = mesh
        self.turbo = _resolve_turbo(cfg, turbo)
        # the latent tier has exactly ONE quantized leg — the int8
        # weight stream below; 'int8x' (an image-sampler residual-read
        # variant, PARITY.md D19) has no distinct latent behavior, so
        # normalize it here to keep the bench metric series
        # ('..._int8turbo') from forking on identical execution
        if self.turbo == "int8x":
            self.turbo = "int8"
        from infodiffusion_tpu.diffusion.schedule import make_schedule

        self.sched = make_schedule(cfg.beta1, cfg.betaT, cfg.diffusion_steps)
        self._fused = False
        self._traj = False
        if mesh is None:  # fused kernels are single-device; mesh path = XLA
            from infodiffusion_tpu.ops.pallas.latent_mlp import (
                fused_latent_supported,
                pack_latent_unet_params,
                use_fused_latent,
            )
            from infodiffusion_tpu.ops.pallas.latent_traj import (
                fused_traj_shapes_ok,
                use_fused_latent_traj,
            )

            backbone = params.get("params", {}).get("backbone")
            want_fwd = use_fused_latent()
            # an EXPLICIT per-forward opt-in outranks the default-on
            # trajectory kernel (so its documented measurement stays
            # reproducible without extra disables)
            want_traj = (
                use_fused_latent_traj()
                and fused_traj_shapes_ok(cfg.a_dim)
                and not want_fwd
            )
            if (
                (want_traj or want_fwd)
                and backbone is not None
                and fused_latent_supported(backbone, cfg.a_dim)
            ):
                import sys

                # matmul-weight dtype follows the model's activation
                # policy (CLAUDE.md: bf16 only via the module dtype)
                self.params = pack_latent_unet_params(
                    backbone, cfg.a_dim, dtype=model.dtype
                )
                self._traj = want_traj
                self._fused = not want_traj
                which = (
                    "whole-trajectory" if want_traj else "per-forward"
                )
                off = (
                    "INFODIFF_DISABLE_FUSED_LATENT_TRAJ=1"
                    if want_traj else "unset INFODIFF_ENABLE_FUSED_LATENT"
                )
                tag = ""
                if self._traj and self.turbo:
                    from infodiffusion_tpu.ops.pallas.latent_traj import (
                        quantize_packed_weights,
                    )

                    self.params = quantize_packed_weights(self.params)
                    tag = ", int8 weight stream"
                print(f"[latent sampler] fused Pallas kernel: on "
                      f"({which}{tag}; {off} for the XLA path)",
                      file=sys.stderr)
        if self.turbo and not self._traj:
            import warnings

            warnings.warn(
                "--turbo requested for the latent sampler but the "
                "whole-trajectory kernel is not active (mesh path, "
                "non-TPU backend, INFODIFF_DISABLE_* set, or unsupported "
                "a_dim) — the latent leg runs bf16; only the trajectory "
                "kernel carries the int8 weight stream"
            )
        self._jit_sample = jax.jit(self._sample_impl)
        self._jit_reverse = jax.jit(self._reverse_impl)
        self._jit_sample_draw = jax.jit(
            self._sample_draw_impl, static_argnames=("n",)
        )
        self._jit_sample_given = jax.jit(self._sample_given_impl)

    def _eps_fn(self, params):
        if self._fused or self._traj:
            from infodiffusion_tpu.ops.pallas.latent_mlp import latent_eps_fn

            return latent_eps_fn(params)
        return lambda x, t, a: self.model.apply(params, x, t)

    def _sample_impl(self, params, xT, key):
        if self._traj:
            from infodiffusion_tpu.ops.pallas.latent_traj import (
                latent_trajectory_pallas,
            )

            return latent_trajectory_pallas(
                params, self.sched, xT, key,
                deterministic=self.cfg.deterministic,
            )
        return sample_loop(
            self._eps_fn(params), self.sched, xT, key, None,
            deterministic=self.cfg.deterministic,
        )

    def _reverse_impl(self, params, x0):
        if self._traj:
            from infodiffusion_tpu.ops.pallas.latent_traj import (
                latent_trajectory_pallas,
            )

            return latent_trajectory_pallas(
                params, self.sched, x0, None,
                deterministic=True, reverse=True,
            )
        return reverse_sample_loop(self._eps_fn(params), self.sched, x0, None)

    def _sample_draw_impl(self, params, key, n):
        k_x, k_s = jr.split(key)
        xT = jr.normal(k_x, (n, self.cfg.a_dim))
        return self._sample_impl(params, xT, k_s)

    def _sample_given_impl(self, params, key, xT):
        # key math inside the jit (see DiffusionProcess._sample_given_impl)
        _k_x, k_s = jr.split(key)
        return self._sample_impl(params, xT, k_s)

    def sampling(self, key, sampling_number=16, xT=None):
        if self.mesh is None:
            if xT is None:
                return self._jit_sample_draw(
                    self.params, key, n=sampling_number
                )
            return self._jit_sample_given(self.params, key, xT)
        k_x, k_s = jr.split(key)
        if xT is None:
            xT = jr.normal(k_x, (sampling_number, self.cfg.a_dim))
        # no mesh_compute_scope here: the latent path has no attention
        # site and already forces the XLA scan under a mesh (the fused
        # trajectory kernel is excluded at construction when mesh is
        # not None), so there is no default-ON kernel to gate
        params, (xT,) = _shard_for_mesh(self.mesh, self.params, [xT])
        return self._jit_sample(params, xT, k_s)

    def reverse_sampling(self, x0):
        return self._jit_reverse(self.params, x0)
