"""Training/eval drivers for every mode (layer L3; reference: run.py).

All ten ``--mode`` values are implemented with the reference's artifact
contract (image/checkpoint/npz naming via generate_exp_string) so the
reference's shell workflows translate 1:1. The compute paths are
TPU-native: one jitted train step, scan-based whole-trajectory samplers,
batched jitted encoding for save_latent.
"""

from __future__ import annotations

import os
import signal
import threading
import warnings

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from infodiffusion_tpu.config import Config, generate_exp_string
from infodiffusion_tpu.data import DataLoader, LatentDataset, get_dataset
from infodiffusion_tpu.data.datasets import dataset_flags
from infodiffusion_tpu.diffusion import (
    DiffusionProcess,
    LatentDiffusionProcess,
    TwoPhaseDiffusionProcess,
)
from infodiffusion_tpu.imaging import save_image
from infodiffusion_tpu.logging_utils import MetricsWriter
from infodiffusion_tpu.models import VAE, build_model
from infodiffusion_tpu.parallel import make_mesh, replicate
from infodiffusion_tpu.train import (
    create_train_state,
    latest_checkpoint_epoch,
    make_optimizer,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)
from infodiffusion_tpu.train.checkpoint import checkpoint_root, restore_params
from infodiffusion_tpu.utils import AverageMeter, ProgressMeter, cos, seed_everything


# ---------------------------------------------------------------------------
# artifact paths (reference: run.py:103-158)
# ---------------------------------------------------------------------------


def image_root(cfg: Config) -> str:
    root = cfg.img_folder
    if cfg.model == "vae":
        root = os.path.join(root, "vae")
    elif cfg.model == "vanilla":
        root = os.path.join(root, "diff")
    return os.path.join(root, generate_exp_string(cfg))


def latent_npz_path(cfg: Config) -> str:
    """'{model}_{exp}_latent.npz' in CWD, dots -> underscores
    (reference: run.py:443,483)."""
    return "{}_{}_latent.npz".format(
        cfg.model, generate_exp_string(cfg).replace(".", "_")
    )


def _mode_subdir(cfg: Config) -> str:
    if cfg.mode == "eval":
        return "eval"
    if cfg.mode == "disentangle":
        return f"disentangle-{cfg.img_id}"
    if cfg.mode == "interpolate":
        return f"interpolate-{cfg.img_id}"
    if cfg.mode in ("save_latent", "plot_latent", "latent_quality"):
        return cfg.mode
    return cfg.mode


def save_images(cfg: Config, sample, sample_num: int = 0, epoch: int = 0):
    """Mode-dependent grid layouts (reference: run.py:103-143)."""
    root = os.path.join(image_root(cfg), _mode_subdir(cfg))
    os.makedirs(root, exist_ok=True)
    arr = np.asarray(sample)
    if cfg.mode == "train":
        path = os.path.join(root, f"sample-{epoch}.png")
        save_image(arr, path, normalize=True, value_range=(-1, 1), nrow=4)
    elif cfg.mode == "eval":
        path = os.path.join(root, f"sample{sample_num:05d}.png")
        save_image(arr, path, normalize=True, value_range=(-1, 1))
    elif cfg.mode in ("disentangle", "interpolate"):
        path = os.path.join(root, f"sample{sample_num}.png")
        save_image(
            arr, path, normalize=True, value_range=(-1, 1), nrow=arr.shape[0]
        )
    else:
        path = os.path.join(root, f"sample-{sample_num:06d}.png")
        save_image(arr, path)
    return path


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def _mesh(cfg: Config):
    """The (data, model) mesh for this run; None on a single device."""
    if jax.device_count() <= 1:
        return None
    return make_mesh(cfg.mesh_devices, model_parallel=cfg.tp)


def _configure_sp(cfg: Config):
    """Arm (or clear) the global sequence-parallel attention context
    (--sp N): AttnBlock's softmax(q k^T) v runs as ring attention over a
    'seq' mesh axis once the token count reaches the threshold
    (parallel/sp.py; reference attention: modules.py:145-164)."""
    from infodiffusion_tpu.parallel.sp import configure_sp

    if getattr(cfg, "sp", 1) > 1:
        from infodiffusion_tpu.parallel.ring_attention import make_seq_mesh

        configure_sp(make_seq_mesh(cfg.sp))
        min_tokens = int(os.environ.get("INFODIFF_SP_MIN_TOKENS", "1024"))
        print(
            f"[sp] ring attention armed: {cfg.sp}-way 'seq' mesh axis, "
            f">= {min_tokens} tokens"
        )
        # --sp takes the devices away from data sharding (the 'seq' mesh
        # owns them), so arming it on a config whose attention grids can
        # never reach the threshold costs data parallelism and buys
        # nothing — say so instead of silently running slower.
        levels = (
            tuple(int(i) for i in cfg.attn.split(","))
            if getattr(cfg, "attn", None) else (2,)
        )
        max_tokens = max(
            (cfg.input_size // (2 ** lvl)) ** 2 for lvl in levels
        )
        if max_tokens < min_tokens:
            warnings.warn(
                f"--sp {cfg.sp} will never engage: the largest attention "
                f"grid for this config is {max_tokens} tokens "
                f"(input_size {cfg.input_size}, attn levels {levels}), "
                f"below the {min_tokens}-token threshold "
                "(INFODIFF_SP_MIN_TOKENS) — yet --sp still disables "
                "data-sharded batches. Drop the flag (or lower the "
                "threshold) unless you mean to force ring attention."
            )
        else:
            # engages, but is it profitable? Each ring hop must have
            # enough chunk compute to hide its ppermute transfer; on
            # v5e the speed-of-light bound is peak/ICI ~ 4.4k tokens
            # per device (~2.2k at the ~50% MFU these narrow shapes
            # reach — arithmetic in docs/PARALLELISM.md).
            profit_tokens = int(
                os.environ.get("INFODIFF_SP_PROFIT_TOKENS", "4096")
            )
            per_device = max_tokens // cfg.sp
            if per_device < profit_tokens:
                warnings.warn(
                    f"--sp {cfg.sp} engages but leaves only {per_device} "
                    f"tokens per device (largest grid {max_tokens}); "
                    f"below ~{profit_tokens} tokens/device "
                    "(INFODIFF_SP_PROFIT_TOKENS) the ring's ppermute "
                    "hops cannot be hidden by chunk compute and SP runs "
                    "latency-bound — on top of the data-parallel width "
                    "it already takes (docs/PARALLELISM.md has the "
                    "cost model). Prefer -dp unless attention memory "
                    "forces the split."
                )
    else:
        configure_sp(None)


def _loader(cfg: Config, mesh=None, with_attrs=False, shuffle=None):
    ds = get_dataset(cfg)
    flip, shuf = dataset_flags(cfg.dataset)
    if shuffle is not None:
        shuf = shuffle
    return DataLoader(
        ds, cfg.batch_size, shuffle=shuf, flip=flip, seed=cfg.r_seed,
        mesh=mesh, with_attrs=with_attrs,
    )


def _init_state(cfg: Config, model, loader, rng, latent=False):
    steps_per_epoch = max(len(loader), 1)
    tx = make_optimizer(cfg.learning_rate, cfg.epochs, steps_per_epoch)
    example = next(iter(loader))
    if isinstance(example, tuple):
        example = example[0]
    # shape/dtype only: on a pod the loader yields global arrays whose
    # shards span other hosts — a device_get/np fetch would raise
    example = jnp.zeros(example.shape, example.dtype)
    state = create_train_state(
        model, rng, example, tx, ema=cfg.ema_decay > 0
    )
    return tx, state, steps_per_epoch


def _load_model_params(cfg: Config, model, example_x, latent=False, epoch=None):
    """Build abstract params then restore the checkpoint at --epochs
    (reference: run.py:231-233). Shapes are traced through ``loss_fn`` so
    every submodule (backbone AND encoder) is materialized — the train
    checkpoints contain both."""
    rngs = {
        "params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
        "reparam": jr.PRNGKey(2), "dropout": jr.PRNGKey(3),
    }
    # only the param *structure* is needed to shape the restore — trace
    # without computing anything
    variables = jax.eval_shape(
        lambda: model.init(rngs, example_x, 0, method=type(model).loss_fn)
    )
    root = checkpoint_root(cfg, latent=latent)
    epoch = cfg.epochs if epoch is None else epoch
    params = restore_params(root, epoch, variables["params"])
    return {"params": params}


# one jitted encoder per (model, regularizer pick): the eval modes call
# _encode_batch repeatedly and an UNJITTED model.apply would run eagerly
# — op-by-op host round-trips over the TPU tunnel
_ENCODE_CACHE: dict = {}


def _eval_encoder(cfg: Config, model):
    from infodiffusion_tpu.train.step import make_eval_encode_step

    key = (model, cfg.kld_weight != 0)
    if key not in _ENCODE_CACHE:
        _ENCODE_CACHE[key] = make_eval_encode_step(
            model, pick_mu=cfg.kld_weight != 0
        )
    return _ENCODE_CACHE[key]


# calibrated quant collections, keyed like _ENCODE_CACHE plus the
# variables object identity: _encode_batch callers reuse one
# (model, variables) pair for a whole eval mode, and re-calibrating per
# batch would cost an extra jitted forward AND make each batch's int8
# scales batch-dependent (unlike _encode_dataset, which calibrates once
# on its first batch). Entries store the variables object itself and
# re-verify identity on hit: a bare id() key could alias a NEW dict
# allocated at a recycled address after the old one is gc'd (two
# checkpoints of one config evaluated in sequence) and silently serve
# stale scales. The strong ref keeps the id valid while the entry
# lives; FIFO eviction bounds what it pins.
_ENCODER_QUANT_CACHE: dict = {}
_ENCODER_QUANT_CACHE_MAX = 4


def _encoder_quant(cfg: Config, model, variables, x):
    """Calibrated 'quant' collection for the --turbo encode tier, or
    None when turbo is off. Calibrates on ``x`` — a REAL data batch (the
    sampler tier calibrates on noise because its inputs are trajectory
    states; the encoder sees images, so data-conditioned scales are both
    available and tighter). One jitted forward on the first call per
    (model, variables, mode); reused afterwards."""
    from infodiffusion_tpu.diffusion.samplers import _resolve_turbo

    mode = _resolve_turbo(cfg, None)
    if not mode:
        return None
    from infodiffusion_tpu.ops.quant import calibrate_encoder

    key = (model, mode, id(variables))
    hit = _ENCODER_QUANT_CACHE.get(key)
    if hit is None or hit[0] is not variables:
        while len(_ENCODER_QUANT_CACHE) >= _ENCODER_QUANT_CACHE_MAX:
            _ENCODER_QUANT_CACHE.pop(next(iter(_ENCODER_QUANT_CACHE)))
        hit = (
            variables,
            calibrate_encoder(model, variables, x=x, mode=mode),
        )
        _ENCODER_QUANT_CACHE[key] = hit
    return hit[1]


def _encode_dataset(cfg: Config, model, variables):
    """Full-dataset deterministic encode -> (all_a [N, a_dim], all_attr)
    (reference: run.py:415-443). Latent selection per the regularizer
    table: kld!=0 -> mu; else -> a (run.py:429-438). Under --turbo the
    Encoder conv bodies run int8 (calibrated on the first batch)."""
    loader = _loader(cfg, with_attrs=True, shuffle=False)
    enc = _eval_encoder(cfg, model)

    all_a, all_attr, quant = [], [], None
    for i, (x, attr) in enumerate(loader):
        if i == 0:
            quant = _encoder_quant(cfg, model, variables, x)
        # f32 at the artifact boundary: under --bf16 the encoder emits
        # bfloat16, which numpy would pickle as objects inside the npz
        all_a.append(
            np.asarray(enc(variables["params"], x, quant), np.float32)
        )
        all_attr.append(
            np.asarray(attr) if attr is not None else
            np.full((len(all_a[-1]),), "No Attributes", dtype=object)
        )
    return np.concatenate(all_a), np.concatenate(all_attr)


def _encode_batch(cfg: Config, model, variables, x):
    quant = _encoder_quant(cfg, model, variables, x)
    return _eval_encoder(cfg, model)(variables["params"], x, quant)


def _nth_batch(loader, n: int):
    """Reference pattern: iterate to batch #n, keep it
    (run.py:373-382,418)."""
    data = None
    for idx, item in enumerate(loader):
        data = item
        if idx == n:
            break
    return data


# ---------------------------------------------------------------------------
# training (reference: run.py:161-212)
# ---------------------------------------------------------------------------

_PREEMPTED = threading.Event()
# cadence (in steps) of the cross-host preemption agreement collective;
# preemption notices give tens of seconds, so a few steps of latency is
# fine and the per-step cost is zero off-cadence
_PREEMPT_SYNC_EVERY = int(os.environ.get("INFODIFF_PREEMPT_SYNC_EVERY", "10"))


def request_preempt(signum=None, frame=None):
    """Ask the training loop to checkpoint the full state and exit at the
    next step boundary. Installed as the SIGTERM handler during train()
    (TPU pod preemption notice); also callable directly, and triggerable
    after N steps via INFODIFF_PREEMPT_AFTER_STEPS=N (fault injection —
    SURVEY.md §5: the reference has no failure-recovery story at all)."""
    _PREEMPTED.set()


def train(cfg: Config, latent: bool = False):
    rng = seed_everything(cfg.r_seed)
    cfg = cfg.with_dataset_config()
    use_pp = cfg.pp > 1
    if use_pp and not latent:
        raise ValueError(
            "--pp pipelines the LatentUNet middle stack and is only "
            "supported for --mode train_latent_ddim (the image UNet's "
            "skip connections couple its stages; parallel/pp.py)"
        )
    _configure_sp(cfg)
    # under --pp/--sp another mesh owns the devices; data sharding is off
    mesh = None if (use_pp or cfg.sp > 1) else _mesh(cfg)
    if mesh is None and (use_pp or cfg.sp > 1):
        dropped = [
            flag for flag, on in (
                ("--fsdp", cfg.fsdp), (f"--tp {cfg.tp}", cfg.tp > 1),
                ("data-sharded batches", jax.device_count() > 1),
            ) if on
        ]
        if dropped:
            warnings.warn(
                f"--{'pp' if use_pp else 'sp'} owns the device mesh: "
                + ", ".join(dropped)
                + " disabled for this run (they need the 'data'/'model' "
                "mesh, which --pp/--sp replaces)"
            )
    print(dict(vars(cfg)))

    if latent:
        ds = LatentDataset(latent_npz_path(cfg))
        loader = DataLoader(
            ds, cfg.batch_size, shuffle=True, seed=cfg.r_seed, mesh=mesh
        )
        model = build_model(cfg, latent=True)
        log_dir = os.path.join(
            cfg.log_folder, generate_exp_string(cfg) + "_latent"
        )
    else:
        loader = _loader(cfg, mesh=mesh)
        model = build_model(cfg)
        log_dir = os.path.join(cfg.log_folder, generate_exp_string(cfg))

    from infodiffusion_tpu.parallel.multihost import is_main_process

    # one writer per pod: hosts on a shared filesystem must not write
    # the same metrics/TB files
    writer = MetricsWriter(
        log_dir, use_tb=cfg.tb_logger, enabled=is_main_process()
    )
    tx, state, steps_per_epoch = _init_state(cfg, model, loader, rng, latent)
    if mesh is not None:
        if cfg.tp > 1:
            from infodiffusion_tpu.parallel import shard_state_tp

            state = shard_state_tp(mesh, state, fsdp=cfg.fsdp)
        elif cfg.fsdp:
            from infodiffusion_tpu.parallel import shard_state_fsdp

            state = shard_state_fsdp(mesh, state)
        else:
            state = replicate(mesh, state)
    if use_pp:
        from infodiffusion_tpu.parallel.pp import (
            make_dp_stage_mesh, make_pp_train_step, make_stage_mesh,
        )

        # dp x pp: when more devices than stages are available, the
        # leftover factor becomes data-parallel pipeline replicas
        # (disable with INFODIFF_PP_NO_DP=1 to pin the round-2 1-D mesh)
        n_dev = jax.device_count()
        dp_width = (
            n_dev // cfg.pp
            if (n_dev % cfg.pp == 0
                and not os.environ.get("INFODIFF_PP_NO_DP"))
            else 1
        )
        microbatches = int(
            os.environ.get("INFODIFF_PP_MICROBATCHES", str(cfg.pp))
        )
        if microbatches < 1:
            raise SystemExit(
                f"INFODIFF_PP_MICROBATCHES must be >= 1, got {microbatches}"
            )
        if cfg.batch_size % microbatches:
            raise ValueError(
                f"--batch_size {cfg.batch_size} must be divisible by the "
                f"pipeline microbatch count {microbatches} (--pp "
                f"{cfg.pp}; override with INFODIFF_PP_MICROBATCHES)"
            )
        if dp_width > 1 and (cfg.batch_size // microbatches) % dp_width:
            # auto-enabled dp must never break an invocation that ran
            # on the round-2 1-D stage mesh: fall back instead of
            # erroring (an EXPLICIT opt-out still exists the other way,
            # INFODIFF_PP_NO_DP=1)
            print(
                f"[pp] microbatch size {cfg.batch_size // microbatches} "
                f"not divisible by the auto data-parallel width "
                f"{dp_width}; falling back to the 1-D stage mesh"
            )
            dp_width = 1
        pp_mesh = (
            make_dp_stage_mesh(dp_width, cfg.pp)
            if dp_width > 1 else make_stage_mesh(cfg.pp)
        )
        step_fn = make_pp_train_step(
            model, tx, pp_mesh, microbatches, ema_decay=cfg.ema_decay
        )
        print(
            f"[pp] GPipe latent training: {cfg.pp} stages x "
            f"{microbatches} microbatches"
            + (f" x {dp_width} data-parallel replicas"
               if dp_width > 1 else "")
        )
    else:
        step_fn = make_train_step(model, tx, ema_decay=cfg.ema_decay)

    ckpt_root = checkpoint_root(cfg, latent=latent)
    start_epoch = 0
    if cfg.resume:
        last = latest_checkpoint_epoch(ckpt_root)
        if last is not None:
            state = restore_checkpoint(ckpt_root, last, state)
            start_epoch = last
            # align the data stream: epoch k of the resumed run must see
            # the same shuffle order / flip masks the uninterrupted
            # run's epoch k saw (noise keys already align via
            # (seed, step) folding — PARITY.md D7)
            loader.fast_forward(start_epoch)
            print(f"Resumed from epoch {last}")

    losses = AverageMeter("Loss", ":.4f")
    progress = ProgressMeter(cfg.epochs, [losses], prefix="Epoch ")
    log_every = int(os.environ.get("INFODIFF_LOG_EVERY", "50"))
    # tracing/profiling hook (SURVEY.md §5: the reference has none):
    # INFODIFF_PROFILE=<dir> captures an XLA trace of steps 10..20 of the
    # first epoch, viewable in TensorBoard / xprof.
    profile_dir = os.environ.get("INFODIFF_PROFILE")
    profile_state = {"on": False, "done": profile_dir is None}
    # preemption-safe training: SIGTERM (the pod preemption notice)
    # checkpoints at the next step boundary and exits cleanly; --resume
    # continues (re-running the interrupted epoch's data on the saved,
    # further-trained state). Host-side step counter — no device sync.
    _PREEMPTED.clear()
    prev_handler = None
    if threading.current_thread() is threading.main_thread():
        prev_handler = signal.signal(signal.SIGTERM, request_preempt)
    preempt_after = int(os.environ.get("INFODIFF_PREEMPT_AFTER_STEPS", "0"))
    host_steps = 0
    # default-ON Pallas kernels refuse inside this scope when the mesh
    # is non-trivial (a pallas_call under GSPMD-sharded jit is
    # unvalidated — ops/gating.py); single-device runs are unaffected
    from infodiffusion_tpu.ops.gating import mesh_compute_scope

    active_mesh = pp_mesh if use_pp else mesh
    try:
        with mesh_compute_scope(active_mesh):
            return _train_loop(
                cfg, loader, state, step_fn, start_epoch, losses, progress,
                log_every, profile_dir, profile_state, writer, ckpt_root,
                preempt_after, host_steps,
            )
    finally:
        if prev_handler is not None:
            signal.signal(signal.SIGTERM, prev_handler)


def _train_loop(
    cfg, loader, state, step_fn, start_epoch, losses, progress, log_every,
    profile_dir, profile_state, writer, ckpt_root, preempt_after, host_steps,
):
    for curr_epoch in range(start_epoch, cfg.epochs):
        total, count = 0.0, 0
        last_metrics = None
        for i, batch in enumerate(loader):
            if isinstance(batch, tuple):
                batch = batch[0]
            if not profile_state["done"]:
                if i == 10:
                    jax.profiler.start_trace(profile_dir)
                    profile_state["on"] = True
                elif i == 20 and profile_state["on"]:
                    jax.block_until_ready(state.params)
                    jax.profiler.stop_trace()
                    profile_state.update(on=False, done=True)
                    print(f"Saved profiler trace to {profile_dir}")
            state, metrics = step_fn(state, batch, curr_epoch)
            last_metrics = metrics
            host_steps += 1
            if preempt_after and host_steps >= preempt_after:
                request_preempt()
            # multi-host: the decision must be AGREED across processes
            # (hosts get SIGTERM at different instants; acting on the
            # local flag alone would deadlock the others' next
            # all-reduce), so poll the collective on a fixed cadence —
            # every host reaches the same host_steps values in lockstep.
            if jax.process_count() == 1:
                preempt_now = _PREEMPTED.is_set()
            elif host_steps % _PREEMPT_SYNC_EVERY == 0:
                from infodiffusion_tpu.parallel.multihost import (
                    agree_on_preemption,
                )

                preempt_now = agree_on_preemption(_PREEMPTED.is_set())
            else:
                preempt_now = False
            if preempt_now:
                from infodiffusion_tpu.train.checkpoint import wait_for_saves

                wait_for_saves()  # flush any in-flight async write first
                # the preemption save itself is synchronous: the process
                # exits right after
                path = save_checkpoint(ckpt_root, curr_epoch, state)
                print(
                    f"Preempted at step {host_steps} of epoch "
                    f"{curr_epoch}: saved full train state to {path}; "
                    f"continue with --resume"
                )
                writer.close()
                return state
            # fetch metrics only every log_every steps: a per-step float()
            # would force a device sync in the hot loop (the reference
            # pays exactly that via loss.item(); run.py:201)
            if i % log_every == 0:
                vals = {k: float(v) for k, v in metrics.items()}
                # failure detection (SURVEY.md §5: none in the reference):
                # fail fast on divergence instead of training on NaNs
                if not np.isfinite(vals["loss"]):
                    raise FloatingPointError(
                        f"non-finite loss {vals['loss']} at step "
                        f"{int(state.step)} (epoch {curr_epoch}) — "
                        f"check LR/precision; metrics: {vals}"
                    )
                total += vals["loss"]
                count += 1
                writer.write(int(state.step), vals)
        if last_metrics is not None and count == 0:
            total += float(last_metrics["loss"])
            count += 1
        losses.update(total / max(count, 1))
        progress.display(curr_epoch)
        print()
        writer.flush()
        if (curr_epoch + 1) % cfg.save_epochs == 0:
            path = save_checkpoint(
                ckpt_root, curr_epoch + 1, state,
                async_save=cfg.async_ckpt, keep=cfg.keep_checkpoints,
            )
            print(f"Saved checkpoint to {path}")
    if cfg.async_ckpt:
        from infodiffusion_tpu.train.checkpoint import wait_for_saves

        wait_for_saves()
    writer.close()
    return state


# ---------------------------------------------------------------------------
# eval modes (reference: run.py:215-526)
# ---------------------------------------------------------------------------


def _build_eval(cfg: Config):
    """Load main model + params for eval (reference: run.py:215-255)."""
    cfg = cfg.with_dataset_config()
    model = build_model(cfg)
    C, H, W = cfg.shape
    x = jnp.zeros((1, H, W, C))
    variables = _load_model_params(cfg, model, x)
    return cfg, model, variables


def _second_model(cfg: Config):
    """The second model for eval_fid (reference: run.py:234-252):
    latent DDIM from {exp}_latent, or a separately-trained vanilla UNet."""
    if cfg.is_latent:
        model2 = build_model(cfg, latent=True)
        vars2 = _load_model_params(
            cfg, model2, jnp.zeros((1, cfg.a_dim)), latent=True
        )
        return model2, vars2
    vanilla_cfg = cfg.replace(model="vanilla", mmd_weight=0.0, kld_weight=0.0)
    model2 = build_model(vanilla_cfg)
    C, H, W = cfg.shape
    vars2 = _load_model_params(vanilla_cfg, model2, jnp.zeros((1, H, W, C)))
    return model2, vars2


def evaluate(cfg: Config):
    from infodiffusion_tpu.parallel.multihost import require_single_process

    require_single_process(f"--mode {cfg.mode}")
    rng = seed_everything(cfg.r_seed)
    _configure_sp(cfg)
    cfg, model, variables = _build_eval(cfg)
    mode = cfg.mode

    # --sp owns the devices as the 'seq' axis; data-sharded eval is off
    mesh = None if cfg.sp > 1 else _mesh(cfg)
    # Build the sampler only for the modes that run it: eval_fid builds
    # its own two-model processes and plot/save_latent/attr never sample
    # — and under --turbo the constructor runs a calibration forward
    # (a cold-compile-scale cost over the TPU tunnel) that those modes
    # would pay for nothing.
    process = None
    if cfg.model in ("diff", "vanilla") and mode in (
        "eval", "latent_quality", "disentangle", "interpolate"
    ):
        process = DiffusionProcess(cfg, model, variables, mesh=mesh)

    # profiling hook for eval modes (train has the same; SURVEY.md §5:
    # the reference has no tracing at all): INFODIFF_PROFILE=<dir>
    # captures an XLA trace of the whole mode, viewable in xprof.
    profile_dir = os.environ.get("INFODIFF_PROFILE")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    try:
        _run_eval_mode(cfg, model, variables, process, mesh, rng)
    finally:
        if profile_dir:
            jax.profiler.stop_trace()
            print(f"Saved profiler trace to {profile_dir}")


def _run_eval_mode(cfg, model, variables, process, mesh, rng):
    mode = cfg.mode
    if mode == "eval":
        _mode_eval(cfg, model, variables, process, rng)
    elif mode == "eval_fid":
        _mode_eval_fid(cfg, model, variables, rng, mesh)
    elif mode == "latent_quality":
        _mode_latent_quality(cfg, model, variables, process, rng)
    elif mode == "plot_latent":
        _mode_plot_latent(cfg, model, variables)
    elif mode == "disentangle":
        _mode_disentangle(cfg, model, variables, process, rng)
    elif mode == "save_latent":
        _mode_save_latent(cfg, model, variables)
    elif mode == "interpolate":
        _mode_interpolate(cfg, model, variables, process, rng)
    elif mode == "attr_classification":
        _mode_attr_classification(cfg, model, variables, rng)
    else:
        raise ValueError(mode)


def _mode_eval(cfg, model, variables, process, rng):
    """Grid samples (reference: run.py:256-264)."""
    if cfg.model in ("diff", "vanilla"):
        for sample_num in range(0, cfg.sampling_number, cfg.batch_size):
            rng, k = jr.split(rng)
            sample = process.sampling(k, sampling_number=16)
            save_images(cfg, sample, sample_num=sample_num)
    else:
        rng, k = jr.split(rng)
        a = jr.normal(k, (cfg.sampling_number, cfg.a_dim))
        sample = model.apply(variables, a, method=VAE.decode)
        save_images(cfg, sample)


def _fid_root(cfg) -> str:
    root = image_root(cfg)
    sub = "eval-fid-latent" if cfg.is_latent else "eval-fid-fast"
    root = os.path.join(root, sub)
    os.makedirs(root, exist_ok=True)
    return root


def _save_fid_batch(cfg, root, batch, sample_num) -> bool:
    """Clip to [-1,1], rescale to [0,1], one PNG per sample
    (reference: run.py:288-295). Returns False when the quota is hit.
    Uses the native thread-pooled PNG writer when available (10k PNGs
    through single-threaded PIL is an eval_fid bottleneck)."""
    arr = np.clip(np.asarray(batch, np.float32), -1, 1)
    arr = (arr + 1.0) / 2.0
    n = min(len(arr), cfg.sampling_number - sample_num)
    full = n == len(arr)
    arr = arr[:n]
    u8 = (arr * 255.0 + 0.5).astype(np.uint8)
    paths = [
        os.path.join(root, f"sample-{sample_num + bn:06d}.png")
        for bn in range(n)
    ]
    try:
        from infodiffusion_tpu.data.native import write_png_batch

        if u8.ndim == 4 and write_png_batch(paths, u8):
            return full
    except Exception:
        pass
    for bn in range(n):
        save_image(arr[bn], paths[bn])
    return full


def _mode_eval_fid(cfg, model, variables, rng, mesh):
    """FID image dump (reference: run.py:265-309).

    ``mesh`` comes from evaluate(): None under --sp (the 'seq' mesh owns
    the devices there — rebuilding the 'data' mesh here would put params
    on all devices while ring attention shard_maps over a subset, and
    jit rejects mixed device sets)."""
    root = _fid_root(cfg)
    print(f"Saving images to {root}")
    if cfg.model == "diff":
        model2, vars2 = _second_model(cfg)
        if cfg.is_latent:
            process = DiffusionProcess(cfg, model, variables, mesh=mesh)
            process_latent = LatentDiffusionProcess(
                cfg, model2, vars2, mesh=mesh
            )
        else:
            process = TwoPhaseDiffusionProcess(
                cfg, model, variables, model2, vars2, mesh=mesh
            )
        # Keep one batch in flight: jax dispatch is async, so launching
        # batch N+1 before np.asarray(batch N) lets the device sample
        # while the host clips + writes PNGs (otherwise the chip idles
        # for the whole host transfer + encode of every batch).
        pending = None
        for sample_num in range(0, cfg.sampling_number, cfg.batch_size):
            rng, k1, k2 = jr.split(rng, 3)
            if cfg.is_latent:
                batch_a = process_latent.sampling(
                    k1, sampling_number=cfg.batch_size
                )
                batch = process.sampling(
                    k2, sampling_number=cfg.batch_size, a=batch_a
                )
            else:
                batch = process.sampling(k2, sampling_number=cfg.batch_size)
            if pending is not None and not _save_fid_batch(
                cfg, root, *pending
            ):
                return
            pending = (batch, sample_num)
        if pending is not None:
            _save_fid_batch(cfg, root, *pending)
        print("DONE")
    elif cfg.model == "vae":
        for sample_num in range(0, cfg.sampling_number, cfg.batch_size):
            rng, k = jr.split(rng)
            a = jr.normal(k, (cfg.batch_size, cfg.a_dim))
            batch = model.apply(variables, a, method=VAE.decode)
            if not _save_fid_batch(cfg, root, batch, sample_num):
                return
        print("DONE")


def _mode_latent_quality(cfg, model, variables, process, rng):
    """Re-sample sampling_number images with a fixed encoded a but fresh
    xT draws (reference: run.py:310-341; batch_size forced to 1)."""
    data = _nth_batch(_loader(cfg, shuffle=False), 10)
    if isinstance(data, tuple):
        data = data[0]
    if cfg.kld_weight != 0:
        # reference quirk: a = mu + exp(0.5*log_var) — std *added*, no
        # noise draw (run.py:327)
        _a, _aq, mu, log_var = model.apply(
            variables, data, method=type(model).encode, sample=False
        )
        a = mu + jnp.exp(0.5 * log_var)
    else:
        a = _encode_batch(cfg, model, variables, data)
    xT = process.reverse_sampling(data, a)
    xT_original = jnp.tile(xT, (cfg.sampling_number, 1, 1, 1))
    a_original = jnp.tile(a, (cfg.sampling_number, 1))
    rng, k1, k2 = jr.split(rng, 3)
    xT = jr.normal(k1, xT_original.shape)
    batch = process.sampling(k2, xT=xT, a=a_original)
    root = os.path.join(image_root(cfg), "latent_quality")
    os.makedirs(root, exist_ok=True)
    arr = np.clip(np.asarray(batch), -1, 1)
    arr = (arr + 1.0) / 2.0
    for bn, img in enumerate(arr):
        save_image(img, os.path.join(root, f"sample-{bn:06d}.png"))


def _mode_plot_latent(cfg, model, variables):
    """2-D scatter of the first two latent dims colored by class
    (reference: run.py:342-370)."""
    all_a, all_attr = _encode_dataset(cfg, model, variables)
    root = os.path.join(image_root(cfg), "plot_latent")
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "plot_latent.png")
    labels = np.asarray(all_attr)
    if labels.ndim > 1:
        labels = labels[:, 0]
    # attr-less datasets (chairs/ffhq) carry "No Attributes" strings
    # (_encode_dataset); color every point as one class instead of
    # crashing on labels.astype(float)
    try:
        labels = labels.astype(float)
    except (ValueError, TypeError):
        labels = np.zeros(len(labels), dtype=float)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.scatter(all_a[:, 0], all_a[:, 1], c=labels, cmap="tab10", s=5)
        plt.savefig(path)
        plt.close()
    except ImportError:
        _scatter_png(all_a[:, 0], all_a[:, 1], labels, path)
    print(f"Saved latent plot to {path}")
    return path


def _scatter_png(x, y, c, path, size=512):
    """Dependency-free scatter rasterizer (fallback when matplotlib is
    unavailable in the image)."""
    img = np.full((size, size, 3), 255, np.uint8)
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    xs = ((x - x.min()) / max(x.ptp(), 1e-9) * (size - 9) + 4).astype(int)
    ys = ((y - y.min()) / max(y.ptp(), 1e-9) * (size - 9) + 4).astype(int)
    # tab10-ish palette
    pal = np.asarray(
        [
            [31, 119, 180], [255, 127, 14], [44, 160, 44], [214, 39, 40],
            [148, 103, 189], [140, 86, 75], [227, 119, 194], [127, 127, 127],
            [188, 189, 34], [23, 190, 207],
        ],
        np.uint8,
    )
    ci = (np.asarray(c) % 10).astype(int)
    for px, py, pc in zip(xs, ys, ci):
        img[size - 1 - py - 1 : size - py + 1, px - 1 : px + 1] = pal[pc]
    from PIL import Image

    Image.fromarray(img).save(path)


def _mode_disentangle(cfg, model, variables, process, rng):
    """Latent traversal: for each latent dim, re-generate with that dim
    swept over 11 etas from a shared reverse-DDIM xT
    (reference: run.py:371-414; batch_size forced to 1)."""
    data = _nth_batch(_loader(cfg, shuffle=False), cfg.img_id)
    if isinstance(data, tuple):
        data = data[0]
    eta = [-1.5, -1.2, -0.9, -0.6, -0.3, 0.0, 0.3, 0.6, 0.9, 1.2, 1.5]
    a = _encode_batch(cfg, model, variables, data)
    if cfg.model == "diff":
        xT = process.reverse_sampling(data, a)
        xT = jnp.tile(xT, (len(eta), 1, 1, 1))
    for k in range(cfg.a_dim):
        a_batch = jnp.tile(a, (len(eta), 1))
        a_batch = a_batch.at[:, k].set(jnp.asarray(eta))
        if cfg.model == "diff":
            rng, kk = jr.split(rng)
            sample = process.sampling(kk, xT=xT, a=a_batch)
        else:
            sample = model.apply(variables, a_batch, method=VAE.decode)
        save_images(cfg, sample, sample_num=k)


def _mode_save_latent(cfg, model, variables):
    """Full-dataset encode -> npz (reference: run.py:415-443)."""
    all_a, all_attr = _encode_dataset(cfg, model, variables)
    path = latent_npz_path(cfg)
    np.savez(path[: -len(".npz")], all_a=all_a, all_attr=all_attr)
    print(f"Saved latents to {path}")
    return path


def _mode_interpolate(cfg, model, variables, process, rng):
    """Slerp on xT + trig interpolation on a over 10 etas
    (reference: run.py:444-481; batch_size forced to 2)."""
    data = _nth_batch(_loader(cfg, shuffle=False), cfg.img_id)
    if isinstance(data, tuple):
        data = data[0]
    a = _encode_batch(cfg, model, variables, data)
    eta = [0.0, 0.11, 0.22, 0.33, 0.44, 0.55, 0.66, 0.77, 0.88, 1.0]
    if cfg.model in ("diff", "vanilla"):
        xT = process.reverse_sampling(data, a)
        theta = jnp.arccos(cos(xT[0], xT[1]))
        intp_x = jnp.stack(
            [
                (jnp.sin((1 - e) * theta) * xT[0] + jnp.sin(e * theta) * xT[1])
                / jnp.sin(theta)
                for e in eta
            ]
        )
    intp_a = jnp.stack(
        [
            jnp.cos(e * jnp.pi / 2) * a[0] + jnp.sin(e * jnp.pi / 2) * a[1]
            for e in eta
        ]
    )
    if cfg.model in ("diff", "vanilla"):
        rng, k = jr.split(rng)
        sample = process.sampling(k, xT=intp_x, a=intp_a)
    else:
        sample = model.apply(variables, intp_a, method=VAE.decode)
    save_images(cfg, sample)


def _mode_attr_classification(cfg: Config, model, variables, rng):
    """Train the FeatureClassifier MLP probe on encoder latents and
    report per-attribute AUROC (extension: the reference defines the
    classifier and artifact branch but never wires the mode —
    models.py:836-859, run.py:119-120; here it works)."""
    import optax
    from sklearn.metrics import roc_auc_score

    from infodiffusion_tpu.models import FeatureClassifier

    all_a, all_attr = _encode_dataset(cfg, model, variables)
    y = np.asarray(all_attr)
    if y.ndim == 1:
        y = y[:, None]
    y = (y > 0).astype(np.float32)
    n = len(all_a)
    n_tr = int(n * 0.8)
    tr_a, te_a = all_a[:n_tr], all_a[n_tr:]
    tr_y, te_y = y[:n_tr], y[n_tr:]

    clf = FeatureClassifier(output_dim=y.shape[1])
    cvars = clf.init(
        {"params": jr.PRNGKey(cfg.r_seed), "dropout": jr.PRNGKey(1)},
        jnp.asarray(tr_a[:2]),
    )
    tx = optax.adam(1e-3)
    opt_state = tx.init(cvars["params"])

    @jax.jit
    def step(params, opt_state, xb, yb, key):
        def loss_fn(p):
            prob = clf.apply(
                {"params": p}, xb, deterministic=False,
                rngs={"dropout": key},
            )
            eps = 1e-7
            bce = -(yb * jnp.log(prob + eps)
                    + (1 - yb) * jnp.log(1 - prob + eps))
            return jnp.mean(bce)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = cvars["params"]
    bs = min(256, n_tr)
    key = jr.PRNGKey(cfg.r_seed)
    for epoch in range(20):
        perm = np.random.RandomState(epoch).permutation(n_tr)
        for i in range(0, n_tr - bs + 1, bs):
            key, k = jr.split(key)
            sl = perm[i : i + bs]
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(tr_a[sl]),
                jnp.asarray(tr_y[sl]), k,
            )
    probs = np.asarray(clf.apply({"params": params}, jnp.asarray(te_a)))
    aurocs = []
    for j in range(y.shape[1]):
        if te_y[:, j].min() == te_y[:, j].max():
            continue
        aurocs.append(roc_auc_score(te_y[:, j], probs[:, j]))
    mean_auroc = float(np.mean(aurocs)) if aurocs else float("nan")
    root = os.path.join(image_root(cfg), "attr_classification")
    os.makedirs(root, exist_ok=True)
    out_path = os.path.join(root, "results.json")
    import json

    with open(out_path, "w") as f:
        json.dump({"mean_auroc": mean_auroc,
                   "per_attr_auroc": aurocs}, f)
    print(f"attr_classification mean AUROC: {mean_auroc:.4f} "
          f"({len(aurocs)} attrs) -> {out_path}")
    return mean_auroc


def save_original_img(cfg: Config):
    """Dump the dataset as [0,1]-scaled PNGs for FID stats
    (reference: run.py:540-549)."""
    from infodiffusion_tpu.parallel.multihost import require_single_process

    require_single_process("--mode save_original_img")
    cfg = cfg.with_dataset_config()
    out = f"./{cfg.dataset}_imgs/"
    os.makedirs(out, exist_ok=True)
    loader = _loader(cfg, shuffle=False)
    i = 0
    for batch in loader:
        if isinstance(batch, tuple):
            batch = batch[0]
        arr = (np.asarray(batch) + 1.0) / 2.0
        # reference saves one grid per *batch* (run.py:547-549)
        save_image(arr, os.path.join(out, f"{i:06d}.png"))
        i += 1
    print(f"Saved original images to {out}")
    return out
