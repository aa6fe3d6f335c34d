"""Cross-implementation parity: load the SAME weights into the actual
PyTorch reference implementation (imported read-only from
/root/reference; override with INFODIFF_REFERENCE_DIR) and into this
framework, then compare full-model forwards and a full reverse-DDIM
trajectory. These tests are the strongest parity guard we have — every
block, init-layout assumption, and schedule constant must line up for a
35M-parameter forward to agree to f32 roundoff. Skipped when the
reference checkout (or torch) is unavailable.

Reference entry points exercised: InfoDiff.forward eval path
(models.py:698-723), Encoder.forward (models.py:488-518), Diff.forward
image+latent (models.py:764-779), VAE.forward (models.py:822-833),
DiffusionProcess._ddim_one_reverse_diffusion_step (sampling.py:62-73).
"""

import os
import sys
import types

import numpy as np
import pytest

REF = os.environ.get("INFODIFF_REFERENCE_DIR", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF, "models.py")),
    reason="reference implementation not available",
)

T = 10
A_DIM = 8
SIZE = 32
CH = 32
B = 2


@pytest.fixture(scope="module")
def ref():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF)
    try:
        import models as ref_models  # noqa: F401  (resolves inside REF)
        import sampling as ref_sampling
    finally:
        sys.path.remove(REF)
    torch.manual_seed(0)
    return types.SimpleNamespace(
        models=ref_models, sampling=ref_sampling, torch=torch
    )


def _args(**over):
    base = dict(
        beta1=1e-5, betaT=1e-2, diffusion_steps=T, input_size=SIZE,
        is_bottleneck=False, unets_channels=CH, encoder_channels=CH,
        a_dim=A_DIM, mmd_weight=0.1, kld_weight=0.0, prior="regular",
        batch_size=B, epochs=2, use_C=False, C_max=25.0, is_latent=False,
        mode="train", model="diff", deterministic=True,
    )
    base.update(over)
    return types.SimpleNamespace(**base)


def _sd(ref_model):
    return {k: v.detach().cpu().numpy() for k, v in ref_model.state_dict().items()}


def _nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def _rngs():
    import jax.random as jr

    return {"params": jr.PRNGKey(0), "noise": jr.PRNGKey(1),
            "reparam": jr.PRNGKey(2), "dropout": jr.PRNGKey(3)}


def _load(model, init_fn, sd):
    """Init our model and overwrite every param from the reference
    state_dict (non-strict: the reference carries dead CrossAttn keys)."""
    from infodiffusion_tpu.interop import load_torch_state_dict

    v = init_fn()
    params = load_torch_state_dict(model, v["params"], sd, strict=False)
    return {**v, "params": params}


def test_infodiff_forward_matches_reference(ref):
    """Same weights, same (x, idx, a) -> same eps prediction, through the
    full AuxiliaryUNet (head/down/middle/up/tail, AdaGN dual FiLM,
    attention, time embedding)."""
    import jax.numpy as jnp

    from infodiffusion_tpu.models import InfoDiff

    torch = ref.torch
    args = _args()
    rm = ref.models.InfoDiff(args, "cpu", shape=(1, SIZE, SIZE)).eval()

    model = InfoDiff(T=T, a_dim=A_DIM, shape=(1, SIZE, SIZE),
                     unets_channels=CH, encoder_channels=CH, epochs=2,
                     mmd_weight=0.1, kld_weight=0.0)
    x_j = jnp.zeros((B, SIZE, SIZE, 1))
    v = _load(
        model,
        lambda: model.init(_rngs(), jnp.zeros((B, SIZE, SIZE, 1)), 0,
                           method=InfoDiff.loss_fn),
        _sd(rm),
    )

    rng = np.random.RandomState(0)
    x = rng.randn(B, 1, SIZE, SIZE).astype(np.float32)
    a = rng.randn(B, A_DIM).astype(np.float32)
    idx = 3
    with torch.no_grad():
        want = rm.forward(torch.from_numpy(x), idx=idx,
                          a=torch.from_numpy(a)).numpy()
    got = model.apply(
        {"params": v["params"]},
        jnp.asarray(_nhwc(x)), jnp.full((B,), idx), jnp.asarray(a),
        deterministic=True,
    )
    np.testing.assert_allclose(
        _nhwc(want), np.asarray(got), atol=5e-4, rtol=1e-3
    )


def test_bottleneck_infodiff_forward_matches_reference(ref):
    """--is_bottleneck variant: plain ResBlocks down/up, Aux only in the
    middle, SiLU->Linear Kaiming fc_a (models.py:329-421)."""
    import jax.numpy as jnp

    from infodiffusion_tpu.models import InfoDiff

    torch = ref.torch
    args = _args(is_bottleneck=True)
    rm = ref.models.InfoDiff(args, "cpu", shape=(1, SIZE, SIZE)).eval()

    model = InfoDiff(T=T, a_dim=A_DIM, shape=(1, SIZE, SIZE),
                     unets_channels=CH, encoder_channels=CH, epochs=2,
                     is_bottleneck=True)
    v = _load(
        model,
        lambda: model.init(_rngs(), jnp.zeros((B, SIZE, SIZE, 1)), 0,
                           method=InfoDiff.loss_fn),
        _sd(rm),
    )
    rng = np.random.RandomState(7)
    x = rng.randn(B, 1, SIZE, SIZE).astype(np.float32)
    a = rng.randn(B, A_DIM).astype(np.float32)
    with torch.no_grad():
        want = rm.forward(torch.from_numpy(x), idx=5,
                          a=torch.from_numpy(a)).numpy()
    got = model.apply(
        {"params": v["params"]},
        jnp.asarray(_nhwc(x)), jnp.full((B,), 5), jnp.asarray(a),
        deterministic=True,
    )
    np.testing.assert_allclose(
        _nhwc(want), np.asarray(got), atol=5e-4, rtol=1e-3
    )


def test_encoder_matches_reference(ref):
    """Encoder (full UNet with skips -> 1ch tail -> fc_a/fc_mu/fc_var):
    deterministic outputs a, mu, log_var agree."""
    import jax.numpy as jnp

    from infodiffusion_tpu.models import InfoDiff

    torch = ref.torch
    args = _args()
    rm = ref.models.InfoDiff(args, "cpu", shape=(1, SIZE, SIZE)).eval()

    model = InfoDiff(T=T, a_dim=A_DIM, shape=(1, SIZE, SIZE),
                     unets_channels=CH, encoder_channels=CH, epochs=2)
    v = _load(
        model,
        lambda: model.init(_rngs(), jnp.zeros((B, SIZE, SIZE, 1)), 0,
                           method=InfoDiff.loss_fn),
        _sd(rm),
    )

    x = np.random.RandomState(1).randn(B, 1, SIZE, SIZE).astype(np.float32)
    with torch.no_grad():
        a_t, _, mu_t, lv_t = rm.encoder(torch.from_numpy(x))
    a_j, _, mu_j, lv_j = model.apply(
        {"params": v["params"]}, jnp.asarray(_nhwc(x)),
        method=InfoDiff.encode, sample=False,
    )
    np.testing.assert_allclose(a_t.numpy(), np.asarray(a_j), atol=5e-4)
    np.testing.assert_allclose(mu_t.numpy(), np.asarray(mu_j), atol=5e-4)
    np.testing.assert_allclose(lv_t.numpy(), np.asarray(lv_j), atol=5e-4)


def test_vanilla_unet_matches_reference(ref):
    """The reference's image UNet cannot even be constructed as-is: its
    middle blocks pass ``crossattn=False`` to a ResBlock whose __init__
    has no such parameter (models.py:31-33 vs modules.py:207) — the
    vanilla/two-phase image path crashes upstream (PARITY.md D14). Shim
    the kwarg away test-locally so the weight/structure parity of every
    OTHER piece can still be validated against torch."""
    import jax.numpy as jnp

    from infodiffusion_tpu.models import Diff

    torch = ref.torch
    args = _args(model="vanilla")

    orig = ref.models.ResBlock

    class _Shim(orig):
        def __init__(self, *a, crossattn=False, **k):
            orig.__init__(self, *a, **k)

    ref.models.ResBlock = _Shim
    try:
        rm = ref.models.Diff(args, "cpu", shape=(1, SIZE, SIZE)).eval()
    finally:
        ref.models.ResBlock = orig

    model = Diff(T=T, shape=(1, SIZE, SIZE), unets_channels=CH)
    v = _load(
        model,
        lambda: model.init(_rngs(), jnp.zeros((B, SIZE, SIZE, 1)), 0,
                           method=Diff.loss_fn),
        _sd(rm),
    )
    x = np.random.RandomState(2).randn(B, 1, SIZE, SIZE).astype(np.float32)
    idx = 7
    with torch.no_grad():
        want = rm.forward(torch.from_numpy(x), idx=idx).numpy()
    got = model.apply(
        {"params": v["params"]}, jnp.asarray(_nhwc(x)), jnp.full((B,), idx),
        deterministic=True,
    )
    np.testing.assert_allclose(
        _nhwc(want), np.asarray(got), atol=5e-4, rtol=1e-3
    )


def test_latent_unet_matches_reference(ref):
    import jax.numpy as jnp

    from infodiffusion_tpu.models import Diff

    torch = ref.torch
    args = _args(is_latent=True)
    rm = ref.models.Diff(args, "cpu", shape=(1, A_DIM, A_DIM)).eval()

    model = Diff(T=T, shape=(1, A_DIM, A_DIM), is_latent=True)
    v = _load(
        model,
        lambda: model.init(_rngs(), jnp.zeros((B, A_DIM)), 0,
                           method=Diff.loss_fn),
        _sd(rm),
    )
    z = np.random.RandomState(3).randn(B, A_DIM).astype(np.float32)
    idx = 4
    with torch.no_grad():
        want = rm.forward(torch.from_numpy(z), idx=idx).numpy()
    got = model.apply(
        {"params": v["params"]}, jnp.asarray(z), jnp.full((B,), idx),
        deterministic=True,
    )
    np.testing.assert_allclose(want, np.asarray(got), atol=5e-4, rtol=1e-3)


def test_vae_matches_reference(ref):
    """No-regularizer VAE decodes from the deterministic `a`
    (models.py:826-827) -> fully deterministic reconstruction."""
    import jax.numpy as jnp

    from infodiffusion_tpu.models import VAE

    torch = ref.torch
    args = _args(mmd_weight=0.0, kld_weight=0.0, model="vae")
    rm = ref.models.VAE(args, "cpu", shape=(1, SIZE, SIZE)).eval()

    model = VAE(a_dim=A_DIM, shape=(1, SIZE, SIZE), encoder_channels=CH,
                mmd_weight=0.0, kld_weight=0.0)
    v = _load(
        model,
        lambda: model.init(_rngs(), jnp.zeros((B, SIZE, SIZE, 1)), 0,
                           method=VAE.loss_fn),
        _sd(rm),
    )
    x = np.random.RandomState(4).randn(B, 1, SIZE, SIZE).astype(np.float32)
    with torch.no_grad():
        want = rm.forward(torch.from_numpy(x)).numpy()
    import jax.random as jr

    # the a_q reparam draw happens inside the encoder even though the
    # no-regularizer VAE decodes from the deterministic `a`
    rec, _, mu_j, lv_j = model.apply(
        {"params": v["params"]}, jnp.asarray(_nhwc(x)), deterministic=True,
        rngs={"reparam": jr.PRNGKey(9)},
    )
    np.testing.assert_allclose(
        _nhwc(want), np.asarray(rec), atol=5e-4, rtol=1e-3
    )


def test_reverse_ddim_trajectory_matches_reference(ref):
    """Full deterministic reverse-DDIM encoding x0 -> xT with the torch
    reference model in the loop vs our lax.scan: the *intended*
    semantics (a forwarded every step), driven via the reference's own
    step generator `_ddim_one_reverse_diffusion_step(x, a)`
    (sampling.py:167-174). The reference's public `reverse_sampling`
    wrapper drops `a` (PARITY.md D13) — that quirk is covered by
    test_reverse_requirk_matches_reference below instead."""
    import jax.numpy as jnp

    from infodiffusion_tpu.diffusion.samplers import reverse_sample_loop
    from infodiffusion_tpu.diffusion.schedule import make_schedule
    from infodiffusion_tpu.models import InfoDiff

    torch = ref.torch
    args = _args()
    rm = ref.models.InfoDiff(args, "cpu", shape=(1, SIZE, SIZE)).eval()
    proc = ref.sampling.DiffusionProcess(args, rm, "cpu", (1, SIZE, SIZE))

    model = InfoDiff(T=T, a_dim=A_DIM, shape=(1, SIZE, SIZE),
                     unets_channels=CH, encoder_channels=CH, epochs=2)
    v = _load(
        model,
        lambda: model.init(_rngs(), jnp.zeros((B, SIZE, SIZE, 1)), 0,
                           method=InfoDiff.loss_fn),
        _sd(rm),
    )

    rng = np.random.RandomState(5)
    x0 = rng.randn(B, 1, SIZE, SIZE).astype(np.float32)
    a = rng.randn(B, A_DIM).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x0)
        for xt in proc._ddim_one_reverse_diffusion_step(
            xt, torch.from_numpy(a)
        ):
            pass
        want = xt.numpy()

    sched = make_schedule(1e-5, 1e-2, T)
    params = v["params"]

    def eps_fn(x, t, a_):
        return model.apply({"params": params}, x, t, a_, deterministic=True)

    got = reverse_sample_loop(eps_fn, sched, jnp.asarray(_nhwc(x0)),
                              jnp.asarray(a))
    np.testing.assert_allclose(
        _nhwc(want), np.asarray(got), atol=2e-3, rtol=1e-3
    )


@pytest.mark.parametrize("deterministic", [True, False])
def test_forward_sampling_trajectory_matches_reference(ref, deterministic):
    """Full generative trajectory xT -> x0 vs the torch reference's step
    generators (_ddim_one_diffusion_step eta=0.01 / _ddpm_one_diffusion
    _step, sampling.py:23-60), with the torch model in the loop and the
    reference's own noise draws injected into our scan. This pins the
    HEADLINE sampling path (what eval/eval_fid generate with) end to end,
    not just single update rules."""
    import jax.numpy as jnp

    from infodiffusion_tpu.diffusion.samplers import sample_loop
    from infodiffusion_tpu.diffusion.schedule import make_schedule
    from infodiffusion_tpu.models import InfoDiff

    torch = ref.torch
    args = _args(deterministic=deterministic)
    rm = ref.models.InfoDiff(args, "cpu", shape=(1, SIZE, SIZE)).eval()
    proc = ref.sampling.DiffusionProcess(args, rm, "cpu", (1, SIZE, SIZE))

    model = InfoDiff(T=T, a_dim=A_DIM, shape=(1, SIZE, SIZE),
                     unets_channels=CH, encoder_channels=CH, epochs=2)
    v = _load(
        model,
        lambda: model.init(_rngs(), jnp.zeros((B, SIZE, SIZE, 1)), 0,
                           method=InfoDiff.loss_fn),
        _sd(rm),
    )

    rng = np.random.RandomState(6)
    xT = rng.randn(B, 1, SIZE, SIZE).astype(np.float32)
    a = rng.randn(B, A_DIM).astype(np.float32)
    # reference noise draws: T-1 randn_like calls (idx T-1..1); at idx 0
    # DDPM uses zeros_like and DDIM skips the draw entirely
    step_noises = [rng.randn(B, 1, SIZE, SIZE).astype(np.float32)
                   for _ in range(T - 1)]

    gen = (proc._ddim_one_diffusion_step if deterministic
           else proc._ddpm_one_diffusion_step)
    with torch.no_grad(), _forced_draws(torch, randn_arrays=list(step_noises)):
        x = torch.from_numpy(xT)
        for x in gen(x, torch.from_numpy(a)):
            pass
        want = x.numpy()

    sched = make_schedule(1e-5, 1e-2, T)
    params = v["params"]

    def eps_fn(x, t, a_):
        return model.apply({"params": params}, x, t, a_, deterministic=True)

    # noises[i] pairs with idx = T-1-i; the idx==0 slot is unused
    noises = jnp.asarray(np.stack(
        [_nhwc(n) for n in step_noises] + [np.zeros_like(_nhwc(xT))]
    ))
    import jax.random as jr

    got = sample_loop(
        eps_fn, sched, jnp.asarray(_nhwc(xT)), jr.PRNGKey(0),
        jnp.asarray(a), deterministic=deterministic, noises=noises,
    )
    np.testing.assert_allclose(
        _nhwc(want), np.asarray(got), atol=2e-3, rtol=1e-3
    )


@pytest.mark.parametrize("deterministic", [True, False])
def test_two_phase_quirk_trajectory_matches_reference(ref, deterministic):
    """Full two-phase trajectory vs the ACTUAL torch
    TwoPhaseDiffusionProcess.sampling (sampling.py:183-204): its phase
    counter is bound once at t=0, so the unconditional model2 runs every
    step (PARITY.md D1) — our --two_phase_reference_quirk reproduces
    exactly that, pinned here with the torch models in the loop and
    the reference's noise draws injected."""
    import jax.numpy as jnp
    import jax.random as jr

    from infodiffusion_tpu.diffusion.samplers import two_phase_sample_loop
    from infodiffusion_tpu.diffusion.schedule import make_schedule
    from infodiffusion_tpu.models import Diff, InfoDiff

    torch = ref.torch
    args = _args(deterministic=deterministic, split_step=T // 2)
    rm1 = ref.models.InfoDiff(args, "cpu", shape=(1, SIZE, SIZE)).eval()
    orig = ref.models.ResBlock

    class _Shim(orig):  # dead crossattn kwarg, PARITY.md D14
        def __init__(self, *a_, crossattn=False, **k):
            orig.__init__(self, *a_, **k)

    ref.models.ResBlock = _Shim
    try:
        vargs = _args(model="vanilla", deterministic=deterministic)
        rm2 = ref.models.Diff(vargs, "cpu", shape=(1, SIZE, SIZE)).eval()
    finally:
        ref.models.ResBlock = orig
    proc = ref.sampling.TwoPhaseDiffusionProcess(
        args, rm1, rm2, "cpu", (1, SIZE, SIZE)
    )

    m1 = InfoDiff(T=T, a_dim=A_DIM, shape=(1, SIZE, SIZE),
                  unets_channels=CH, encoder_channels=CH, epochs=2)
    v1 = _load(
        m1,
        lambda: m1.init(_rngs(), jnp.zeros((B, SIZE, SIZE, 1)), 0,
                        method=InfoDiff.loss_fn),
        _sd(rm1),
    )
    m2 = Diff(T=T, shape=(1, SIZE, SIZE), unets_channels=CH)
    v2 = _load(
        m2,
        lambda: m2.init(_rngs(), jnp.zeros((B, SIZE, SIZE, 1)), 0,
                        method=Diff.loss_fn),
        _sd(rm2),
    )

    rng = np.random.RandomState(7)
    xT = rng.randn(B, 1, SIZE, SIZE).astype(np.float32)
    a = rng.randn(B, A_DIM).astype(np.float32)
    step_noises = [rng.randn(B, 1, SIZE, SIZE).astype(np.float32)
                   for _ in range(T - 1)]
    # DDPM additionally draws (zeros_like, uninjected) at idx 0; DDIM
    # skips the idx-0 draw — either way T-1 randn_like pops
    with torch.no_grad(), _forced_draws(torch, randn_arrays=list(step_noises)):
        want = proc.sampling(
            xT=torch.from_numpy(xT), a=torch.from_numpy(a)
        ).numpy()

    sched = make_schedule(1e-5, 1e-2, T)
    p1, p2 = v1["params"], v2["params"]

    def eps_cond(x, t, a_):
        return m1.apply({"params": p1}, x, t, a_, deterministic=True)

    def eps_uncond(x, t):
        return m2.apply({"params": p2}, x, t, deterministic=True)

    noises = jnp.asarray(np.stack(
        [_nhwc(n) for n in step_noises] + [np.zeros_like(_nhwc(xT))]
    ))
    got = two_phase_sample_loop(
        eps_cond, eps_uncond, sched, jnp.asarray(_nhwc(xT)), jr.PRNGKey(0),
        jnp.asarray(a), T // 2, deterministic=deterministic,
        reference_quirk=True, noises=noises,
    )
    np.testing.assert_allclose(
        _nhwc(want), np.asarray(got), atol=2e-3, rtol=1e-3
    )


@pytest.mark.parametrize("deterministic", [True, False])
def test_latent_sampling_trajectory_matches_reference(ref, deterministic):
    """Latent DDIM/DDPM trajectory over [B, a_dim] vectors vs the torch
    LatentDiffusionProcess step generators (sampling.py:227-258), with
    the torch LatentUNet in the loop and its noise draws injected —
    the train_latent_ddim -> eval_fid --is_latent product path."""
    import jax.numpy as jnp
    import jax.random as jr

    from infodiffusion_tpu.diffusion.samplers import sample_loop
    from infodiffusion_tpu.diffusion.schedule import make_schedule
    from infodiffusion_tpu.models import Diff

    torch = ref.torch
    args = _args(is_latent=True, deterministic=deterministic,
                 split_step=T // 2)  # read by __init__, unused in latent
    rm = ref.models.Diff(args, "cpu", shape=(1, A_DIM, A_DIM)).eval()
    proc = ref.sampling.LatentDiffusionProcess(args, rm, "cpu")

    model = Diff(T=T, shape=(1, A_DIM, A_DIM), is_latent=True)
    v = _load(
        model,
        lambda: model.init(_rngs(), jnp.zeros((B, A_DIM)), 0,
                           method=Diff.loss_fn),
        _sd(rm),
    )

    rng = np.random.RandomState(9)
    zT = rng.randn(B, A_DIM).astype(np.float32)
    step_noises = [rng.randn(B, A_DIM).astype(np.float32)
                   for _ in range(T - 1)]
    gen = (proc._ddim_one_diffusion_step if deterministic
           else proc._ddpm_one_diffusion_step)
    with torch.no_grad(), _forced_draws(torch, randn_arrays=list(step_noises)):
        z = torch.from_numpy(zT)
        for z in gen(z):
            pass
        want = z.numpy()

    sched = make_schedule(1e-5, 1e-2, T)
    params = v["params"]

    def eps_fn(z, t, _a):
        return model.apply({"params": params}, z, t, deterministic=True)

    noises = jnp.asarray(np.stack(step_noises + [np.zeros_like(zT)]))
    got = sample_loop(
        eps_fn, sched, jnp.asarray(zT), jr.PRNGKey(0),
        deterministic=deterministic, noises=noises,
    )
    np.testing.assert_allclose(want, np.asarray(got), atol=1e-4, rtol=1e-3)


def test_torch_checkpoint_file_roundtrip(ref, tmp_path):
    """The exact on-disk format the reference produces (torch.save of a
    state_dict, run.py:157) loads through interop.load_torch_checkpoint
    and reproduces the reference forward — guards the FILE layer on top
    of the in-memory state_dict mapping."""
    import jax.numpy as jnp

    from infodiffusion_tpu.interop import load_torch_checkpoint
    from infodiffusion_tpu.models import InfoDiff

    torch = ref.torch
    args = _args()
    rm = ref.models.InfoDiff(args, "cpu", shape=(1, SIZE, SIZE)).eval()
    path = str(tmp_path / "model-50.pth")
    torch.save(rm.state_dict(), path)

    model = InfoDiff(T=T, a_dim=A_DIM, shape=(1, SIZE, SIZE),
                     unets_channels=CH, encoder_channels=CH, epochs=2)
    v = model.init(_rngs(), jnp.zeros((B, SIZE, SIZE, 1)), 0,
                   method=InfoDiff.loss_fn)
    params = load_torch_checkpoint(model, v["params"], path)

    rng = np.random.RandomState(8)
    x = rng.randn(B, 1, SIZE, SIZE).astype(np.float32)
    a = rng.randn(B, A_DIM).astype(np.float32)
    with torch.no_grad():
        want = rm.forward(torch.from_numpy(x), idx=2,
                          a=torch.from_numpy(a)).numpy()
    got = model.apply(
        {"params": params},
        jnp.asarray(_nhwc(x)), jnp.full((B,), 2), jnp.asarray(a),
        deterministic=True,
    )
    np.testing.assert_allclose(
        _nhwc(want), np.asarray(got), atol=5e-4, rtol=1e-3
    )


def test_reverse_requirk_matches_reference(ref):
    """--reverse_reference_quirk reproduces the reference's PUBLIC
    reverse_sampling wrapper, which drops `a` and re-encodes the current
    noisy sample every step (sampling.py:84-87 -> models.py:708-710;
    PARITY.md D13). With MMD-only routing the re-encoded conditioning is
    the deterministic `a` — no RNG involved — so both implementations
    are exactly comparable."""
    import jax.numpy as jnp

    from infodiffusion_tpu.diffusion.samplers import DiffusionProcess
    from infodiffusion_tpu.models import InfoDiff

    torch = ref.torch
    args = _args()
    rm = ref.models.InfoDiff(args, "cpu", shape=(1, SIZE, SIZE)).eval()
    proc = ref.sampling.DiffusionProcess(args, rm, "cpu", (1, SIZE, SIZE))

    model = InfoDiff(T=T, a_dim=A_DIM, shape=(1, SIZE, SIZE),
                     unets_channels=CH, encoder_channels=CH, epochs=2)
    v = _load(
        model,
        lambda: model.init(_rngs(), jnp.zeros((B, SIZE, SIZE, 1)), 0,
                           method=InfoDiff.loss_fn),
        _sd(rm),
    )

    rng = np.random.RandomState(6)
    x0 = rng.randn(B, 1, SIZE, SIZE).astype(np.float32)
    a = rng.randn(B, A_DIM).astype(np.float32)
    with torch.no_grad():
        want = proc.reverse_sampling(
            torch.from_numpy(x0), torch.from_numpy(a)
        ).numpy()

    cfg = types.SimpleNamespace(
        model="diff", beta1=1e-5, betaT=1e-2, diffusion_steps=T,
        deterministic=True, a_dim=A_DIM, sampling_steps=None, r_seed=0,
        reverse_reference_quirk=True,
    )
    dp = DiffusionProcess(cfg, model, {"params": v["params"]},
                          shape=(1, SIZE, SIZE))
    got = dp.reverse_sampling(jnp.asarray(_nhwc(x0)), jnp.asarray(a))
    np.testing.assert_allclose(
        _nhwc(want), np.asarray(got), atol=2e-3, rtol=1e-3
    )
    # (No quirk-vs-intended difference assertion here: with a randomly
    # initialized model the aux conditioning barely moves the output, so
    # the two semantics agree to ~1e-6 — only a TRAINED encoder makes
    # them diverge. The intended-semantics path is pinned against torch
    # by test_reverse_ddim_trajectory_matches_reference above.)


# ---------------------------------------------------------------------------
# Composite loss-scalar parity (round-2 VERDICT missing #3): same weights,
# same batch, same random draws -> the full loss_fn scalar agrees with the
# torch reference for every regularizer combo (reference: models.py:632-696,
# 753-762, 795-819). The four random draws (t, eps, reparam, prior) are
# forced equal on both sides: torch via monkeypatched torch.randint /
# torch.randn_like, ours via the loss_fn injection kwargs.
# ---------------------------------------------------------------------------

import contextlib
from collections import deque


@contextlib.contextmanager
def _forced_draws(torch, t=None, randn_arrays=()):
    """Force torch.randint -> `t` and make successive torch.randn_like
    calls pop `randn_arrays` in order (shapes are asserted)."""
    q = deque(randn_arrays)
    orig_randint, orig_randn_like = torch.randint, torch.randn_like

    def fake_randint(low, high, size, **kw):
        assert t is not None and tuple(size) == t.shape
        return torch.from_numpy(t)

    def fake_randn_like(x, **kw):
        arr = q.popleft()
        assert tuple(x.shape) == arr.shape, (x.shape, arr.shape)
        return torch.from_numpy(arr)

    torch.randint, torch.randn_like = fake_randint, fake_randn_like
    try:
        yield
    finally:
        torch.randint, torch.randn_like = orig_randint, orig_randn_like
    assert not q, "unconsumed forced draws"


@pytest.mark.parametrize(
    "mmd_w,kld_w,use_C,curr_epoch",
    [
        (0.1, 0.0, False, 0),   # MMD only (routes a, MMD target a)
        (0.0, 1e-3, False, 0),  # KLD only (routes a_q, batch-summed KLD)
        (0.1, 1e-3, False, 0),  # both (routes a_q, MMD target mu)
        (0.0, 1e-3, True, 1),   # KLD + capacity control
        (0.1, 1e-3, True, 1),   # both + capacity control
    ],
)
def test_infodiff_composite_loss_matches_reference(
    ref, mmd_w, kld_w, use_C, curr_epoch
):
    import jax.numpy as jnp

    from infodiffusion_tpu.models import InfoDiff

    torch = ref.torch
    args = _args(mmd_weight=mmd_w, kld_weight=kld_w, use_C=use_C)
    rm = ref.models.InfoDiff(args, "cpu", shape=(1, SIZE, SIZE)).eval()

    model = InfoDiff(
        T=T, a_dim=A_DIM, shape=(1, SIZE, SIZE), unets_channels=CH,
        encoder_channels=CH, epochs=2, mmd_weight=mmd_w, kld_weight=kld_w,
        use_C=use_C, C_max=25.0, prior="regular",
    )
    v = _load(
        model,
        lambda: model.init(_rngs(), jnp.zeros((B, SIZE, SIZE, 1)), 0,
                           method=InfoDiff.loss_fn),
        _sd(rm),
    )

    rng = np.random.RandomState(11)
    x = rng.randn(B, 1, SIZE, SIZE).astype(np.float32)
    t = rng.randint(0, T, (B,)).astype(np.int64)
    eps = rng.randn(B, 1, SIZE, SIZE).astype(np.float32)
    rep = rng.randn(B, A_DIM).astype(np.float32)
    prior = rng.randn(B, A_DIM).astype(np.float32)

    # torch draw order inside loss_fn: eps (forward), reparam (encoder),
    # then — only when MMD is active — the regular-prior draw
    randn_arrays = [eps, rep] + ([prior] if mmd_w != 0 else [])
    with torch.no_grad(), _forced_draws(torch, t=t, randn_arrays=randn_arrays):
        want = float(
            rm.loss_fn(args, torch.from_numpy(x), curr_epoch=curr_epoch)
        )

    loss, _aux = model.apply(
        {"params": v["params"]}, jnp.asarray(_nhwc(x)), curr_epoch,
        method=InfoDiff.loss_fn, deterministic=True,
        t=jnp.asarray(t), eps=jnp.asarray(_nhwc(eps)),
        reparam_eps=jnp.asarray(rep),
        prior_samples=(jnp.asarray(prior) if mmd_w != 0 else None),
    )
    np.testing.assert_allclose(want, float(loss), atol=1e-4, rtol=1e-4)


def test_latent_diff_composite_loss_matches_reference(ref):
    """Latent Diff loss (eps-MSE over [B, a_dim] vectors with the 2-D
    alpha_bar broadcast, reference: models.py:753-771)."""
    import jax.numpy as jnp

    from infodiffusion_tpu.models import Diff

    torch = ref.torch
    args = _args(is_latent=True)
    rm = ref.models.Diff(args, "cpu", shape=(1, A_DIM, A_DIM)).eval()

    model = Diff(T=T, shape=(1, A_DIM, A_DIM), is_latent=True)
    v = _load(
        model,
        lambda: model.init(_rngs(), jnp.zeros((B, A_DIM)), 0,
                           method=Diff.loss_fn),
        _sd(rm),
    )
    rng = np.random.RandomState(12)
    z = rng.randn(B, A_DIM).astype(np.float32)
    t = rng.randint(0, T, (B,)).astype(np.int64)
    eps = rng.randn(B, A_DIM).astype(np.float32)
    with torch.no_grad(), _forced_draws(torch, t=t, randn_arrays=[eps]):
        want = float(rm.loss_fn(args, torch.from_numpy(z)))
    loss, _aux = model.apply(
        {"params": v["params"]}, jnp.asarray(z), 0, method=Diff.loss_fn,
        deterministic=True, t=jnp.asarray(t), eps=jnp.asarray(eps),
    )
    np.testing.assert_allclose(want, float(loss), atol=1e-4, rtol=1e-4)


def test_vanilla_diff_composite_loss_matches_reference(ref):
    """Vanilla image-UNet Diff loss. The reference UNet cannot be
    constructed as-is (dead crossattn kwarg, PARITY.md D14) — shimmed
    like test_vanilla_unet_matches_reference."""
    import jax.numpy as jnp

    from infodiffusion_tpu.models import Diff

    torch = ref.torch
    args = _args(model="vanilla")
    orig = ref.models.ResBlock

    class _Shim(orig):
        def __init__(self, *a, crossattn=False, **k):
            orig.__init__(self, *a, **k)

    ref.models.ResBlock = _Shim
    try:
        rm = ref.models.Diff(args, "cpu", shape=(1, SIZE, SIZE)).eval()
    finally:
        ref.models.ResBlock = orig

    model = Diff(T=T, shape=(1, SIZE, SIZE), unets_channels=CH)
    v = _load(
        model,
        lambda: model.init(_rngs(), jnp.zeros((B, SIZE, SIZE, 1)), 0,
                           method=Diff.loss_fn),
        _sd(rm),
    )
    rng = np.random.RandomState(13)
    x = rng.randn(B, 1, SIZE, SIZE).astype(np.float32)
    t = rng.randint(0, T, (B,)).astype(np.int64)
    eps = rng.randn(B, 1, SIZE, SIZE).astype(np.float32)
    with torch.no_grad(), _forced_draws(torch, t=t, randn_arrays=[eps]):
        want = float(rm.loss_fn(args, torch.from_numpy(x)))
    loss, _aux = model.apply(
        {"params": v["params"]}, jnp.asarray(_nhwc(x)), 0,
        method=Diff.loss_fn, deterministic=True,
        t=jnp.asarray(t), eps=jnp.asarray(_nhwc(eps)),
    )
    np.testing.assert_allclose(want, float(loss), atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# Gradient parity: d(loss)/d(theta) for EVERY live parameter agrees with
# torch autograd on identical weights + batch + draws. This pins the whole
# backward pass (conv/GN/attention/FiLM VJPs, the loss-term compositions,
# and the interop layout transforms, which are element permutations and so
# map gradients exactly like weights). Reference: models.py:632-696 under
# torch autograd.
# ---------------------------------------------------------------------------


def _torch_grads(rm, loss):
    loss.backward()
    return {
        k: p.grad.detach().cpu().numpy()
        for k, p in rm.named_parameters()
        if p.grad is not None  # dead crossattn params get no grad
    }


def _compare_grads(model, jax_grads, torch_grads, atol, rtol):
    """Map our grad pytree through the torch-layout exporter and compare
    every key torch also produced a grad for."""
    from infodiffusion_tpu.interop import export_torch_state_dict

    ours = export_torch_state_dict(model, jax_grads)
    missing = set(torch_grads) - set(ours)
    assert not missing, f"keys torch has grads for but we don't: {missing}"
    for k, want in torch_grads.items():
        np.testing.assert_allclose(
            want, ours[k], atol=atol, rtol=rtol,
            err_msg=f"gradient mismatch at {k}",
        )


def test_infodiff_loss_gradients_match_reference(ref):
    """Full InfoDiff loss (denoise + recon + MMD + KLD, both regularizers
    active) backward pass vs torch autograd, every parameter."""
    import jax
    import jax.numpy as jnp

    from infodiffusion_tpu.models import InfoDiff

    torch = ref.torch
    args = _args(mmd_weight=0.1, kld_weight=1e-3)
    rm = ref.models.InfoDiff(args, "cpu", shape=(1, SIZE, SIZE)).eval()

    model = InfoDiff(
        T=T, a_dim=A_DIM, shape=(1, SIZE, SIZE), unets_channels=CH,
        encoder_channels=CH, epochs=2, mmd_weight=0.1, kld_weight=1e-3,
    )
    v = _load(
        model,
        lambda: model.init(_rngs(), jnp.zeros((B, SIZE, SIZE, 1)), 0,
                           method=InfoDiff.loss_fn),
        _sd(rm),
    )

    rng = np.random.RandomState(21)
    x = rng.randn(B, 1, SIZE, SIZE).astype(np.float32)
    t = rng.randint(0, T, (B,)).astype(np.int64)
    eps = rng.randn(B, 1, SIZE, SIZE).astype(np.float32)
    rep = rng.randn(B, A_DIM).astype(np.float32)
    prior = rng.randn(B, A_DIM).astype(np.float32)

    with _forced_draws(torch, t=t, randn_arrays=[eps, rep, prior]):
        loss_t = rm.loss_fn(args, torch.from_numpy(x), curr_epoch=0)
    tg = _torch_grads(rm, loss_t)

    def loss_j(params):
        loss, _aux = model.apply(
            {"params": params}, jnp.asarray(_nhwc(x)), 0,
            method=InfoDiff.loss_fn, deterministic=True,
            t=jnp.asarray(t), eps=jnp.asarray(_nhwc(eps)),
            reparam_eps=jnp.asarray(rep), prior_samples=jnp.asarray(prior),
        )
        return loss

    jg = jax.grad(loss_j)(v["params"])
    _compare_grads(model, jg, tg, atol=5e-4, rtol=5e-3)


def test_latent_diff_loss_gradients_match_reference(ref):
    """Latent MLP Diff backward pass vs torch autograd (LayerNorm +
    FiLM-style time conditioning + skip MLP VJPs)."""
    import jax
    import jax.numpy as jnp

    from infodiffusion_tpu.models import Diff

    torch = ref.torch
    args = _args(is_latent=True)
    rm = ref.models.Diff(args, "cpu", shape=(1, A_DIM, A_DIM)).eval()

    model = Diff(T=T, shape=(1, A_DIM, A_DIM), is_latent=True)
    v = _load(
        model,
        lambda: model.init(_rngs(), jnp.zeros((B, A_DIM)), 0,
                           method=Diff.loss_fn),
        _sd(rm),
    )
    rng = np.random.RandomState(22)
    z = rng.randn(B, A_DIM).astype(np.float32)
    t = rng.randint(0, T, (B,)).astype(np.int64)
    eps = rng.randn(B, A_DIM).astype(np.float32)

    with _forced_draws(torch, t=t, randn_arrays=[eps]):
        loss_t = rm.loss_fn(args, torch.from_numpy(z))
    tg = _torch_grads(rm, loss_t)

    def loss_j(params):
        loss, _aux = model.apply(
            {"params": params}, jnp.asarray(z), 0, method=Diff.loss_fn,
            deterministic=True, t=jnp.asarray(t), eps=jnp.asarray(eps),
        )
        return loss

    jg = jax.grad(loss_j)(v["params"])
    _compare_grads(model, jg, tg, atol=5e-4, rtol=5e-3)


def test_vae_loss_gradients_match_reference(ref):
    """InfoVAE backward pass vs torch autograd (encoder + decoder +
    MMD gradient flow through the reparametrized latent)."""
    import jax
    import jax.numpy as jnp

    from infodiffusion_tpu.models import VAE

    torch = ref.torch
    args = _args(mmd_weight=0.1, kld_weight=0.0, model="vae")
    rm = ref.models.VAE(args, "cpu", shape=(1, SIZE, SIZE)).eval()

    model = VAE(a_dim=A_DIM, shape=(1, SIZE, SIZE), encoder_channels=CH,
                mmd_weight=0.1, kld_weight=0.0, epochs=2)
    v = _load(
        model,
        lambda: model.init(_rngs(), jnp.zeros((B, SIZE, SIZE, 1)), 0,
                           method=VAE.loss_fn),
        _sd(rm),
    )
    rng = np.random.RandomState(23)
    x = rng.randn(B, 1, SIZE, SIZE).astype(np.float32)
    rep = rng.randn(B, A_DIM).astype(np.float32)
    prior = rng.randn(B, A_DIM).astype(np.float32)

    with _forced_draws(torch, randn_arrays=[rep, prior]):
        loss_t = rm.loss_fn(args, torch.from_numpy(x), curr_epoch=0)
    tg = _torch_grads(rm, loss_t)

    def loss_j(params):
        loss, _aux = model.apply(
            {"params": params}, jnp.asarray(_nhwc(x)), 0,
            method=VAE.loss_fn, deterministic=True,
            reparam_eps=jnp.asarray(rep), prior_samples=jnp.asarray(prior),
        )
        return loss

    jg = jax.grad(loss_j)(v["params"])
    _compare_grads(model, jg, tg, atol=5e-4, rtol=5e-3)


def test_optimizer_step_matches_torch_adamw(ref):
    """Two optimizer steps on bitwise-identical gradients produce the
    same updated parameters as the reference's torch pipeline
    (AdamW(lr, wd=1e-5) + clip_grad_norm_(1.0), run.py:177,198-199).
    Step 1 runs unclipped (norm < 1), step 2 scales the grads x50 so the
    clip branch actually executes — this pins optax vs torch AdamW
    moment math, bias correction, decoupled weight decay, and the
    global-norm clip, independent of forward/backward roundoff (gradient
    parity is pinned separately)."""
    import jax
    import jax.numpy as jnp
    import optax

    from infodiffusion_tpu.interop import (
        export_torch_state_dict,
        load_torch_state_dict,
    )
    from infodiffusion_tpu.models import Diff
    from infodiffusion_tpu.train.state import make_optimizer

    torch = ref.torch
    LR = 1e-4
    args = _args(is_latent=True)
    rm = ref.models.Diff(args, "cpu", shape=(1, A_DIM, A_DIM))

    model = Diff(T=T, shape=(1, A_DIM, A_DIM), is_latent=True)
    v = _load(
        model,
        lambda: model.init(_rngs(), jnp.zeros((B, A_DIM)), 0,
                           method=Diff.loss_fn),
        _sd(rm),
    )
    params = v["params"]
    # epochs=2, steps_per_epoch=100: both steps land in epoch 0, where
    # the schedule is the base LR on both sides (staircase test pins the
    # later epochs; torch's warmup scheduler only steps at epoch ends)
    tx = make_optimizer(LR, epochs=2, steps_per_epoch=100)
    opt_state = tx.init(params)

    opt = torch.optim.AdamW(rm.parameters(), lr=LR, weight_decay=1e-5)
    rng = np.random.RandomState(31)
    zeros = jax.tree.map(jnp.zeros_like, params)

    for step, scale in [(0, 1.0), (1, 50.0)]:
        z = rng.randn(B, A_DIM).astype(np.float32)
        t = rng.randint(0, T, (B,)).astype(np.int64)
        eps = rng.randn(B, A_DIM).astype(np.float32)
        opt.zero_grad()
        with _forced_draws(torch, t=t, randn_arrays=[eps]):
            loss = rm.loss_fn(args, torch.from_numpy(z))
        loss.backward()
        grad_sd = {}
        for k, p in rm.named_parameters():
            if p.grad is not None:
                p.grad.mul_(scale)
                # .copy(): .numpy() aliases the grad storage, which the
                # in-place clip below rewrites — without it both sides
                # would consume post-clip grads and our clip branch
                # would never be exercised against torch's
                grad_sd[k] = p.grad.detach().cpu().numpy().copy()
        gnorm = float(
            torch.nn.utils.clip_grad_norm_(rm.parameters(), 1.0)
        )
        if step == 1:
            assert gnorm > 1.0, "x50 grads must engage the clip branch"
        opt.step()

        # identical (pre-clip) grads into our optimizer chain
        grads = load_torch_state_dict(model, zeros, grad_sd, strict=False)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    ours = export_torch_state_dict(model, params)
    want = _sd(rm)
    for k in ours:
        np.testing.assert_allclose(
            want[k], ours[k], atol=1e-6, rtol=1e-5,
            err_msg=f"post-step parameter mismatch at {k}",
        )


def test_multistep_latent_training_trajectory_matches_reference(ref):
    """TWELVE consecutive optimizer steps of the latent Diff across an
    epoch boundary — each side computes its OWN gradients (unlike
    test_optimizer_step_matches_torch_adamw, which injects torch's), so
    this pins the INTEGRATED loop the reference runs per epoch
    (run.py:188-212: loss -> backward -> clip_grad_norm_(1.0) ->
    AdamW.step, scheduler.step() at epoch end): per-step losses AND
    final parameters must agree after forward/backward roundoff
    accumulates for 12 steps. Draws (t, eps) are injected identically;
    the 2x6 step layout crosses the epoch-0 -> epoch-1 LR handoff
    (base -> 2*base), which both schedules produce exactly (the
    torch-2.x cosine warp of PARITY.md D18 only starts at epoch 2, kept
    out of range here on purpose)."""
    import jax
    import jax.numpy as jnp
    import optax

    from infodiffusion_tpu.interop import export_torch_state_dict
    from infodiffusion_tpu.models import Diff
    from infodiffusion_tpu.train.state import make_optimizer

    torch = ref.torch
    _sys = sys
    _sys.path.insert(0, REF)
    try:
        import utils as ref_utils
    finally:
        _sys.path.remove(REF)

    LR, EPOCHS, SPE = 1e-3, 20, 6  # 2 epochs x 6 steps, big-ish LR so
    # parameters actually move (total |Δθ| ~ 12*2e-3 per element)
    args = _args(is_latent=True, epochs=EPOCHS)
    # .eval() = dropout off (matching deterministic=True on our side);
    # autograd still runs — eval only flips module behavior flags
    rm = ref.models.Diff(args, "cpu", shape=(1, A_DIM, A_DIM)).eval()

    model = Diff(T=T, shape=(1, A_DIM, A_DIM), is_latent=True)
    v = _load(
        model,
        lambda: model.init(_rngs(), jnp.zeros((B, A_DIM)), 0,
                           method=Diff.loss_fn),
        _sd(rm),
    )
    params = v["params"]
    tx = make_optimizer(LR, epochs=EPOCHS, steps_per_epoch=SPE)
    opt_state = tx.init(params)

    opt = torch.optim.AdamW(rm.parameters(), lr=LR, weight_decay=1e-5)
    cos = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=EPOCHS, eta_min=0, last_epoch=-1
    )
    warm = ref_utils.GradualWarmupScheduler(
        opt, multiplier=2.0, warm_epoch=1, after_scheduler=cos
    )

    @jax.jit
    def our_step(params, opt_state, z, t_arr, eps):
        def loss_fn(p):
            loss, _aux = model.apply(
                {"params": p}, z, 0, method=Diff.loss_fn,
                deterministic=True, t=t_arr, eps=eps,
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(41)
    losses_t, losses_j = [], []
    for epoch in range(2):
        for _ in range(SPE):
            z = rng.randn(B, A_DIM).astype(np.float32)
            t_arr = rng.randint(0, T, (B,)).astype(np.int64)
            eps = rng.randn(B, A_DIM).astype(np.float32)

            opt.zero_grad()
            with _forced_draws(torch, t=t_arr, randn_arrays=[eps]):
                loss = rm.loss_fn(args, torch.from_numpy(z))
            loss.backward()
            torch.nn.utils.clip_grad_norm_(rm.parameters(), 1.0)
            opt.step()
            losses_t.append(float(loss.detach()))

            params, opt_state, lj = our_step(
                params, opt_state, jnp.asarray(z), jnp.asarray(t_arr),
                jnp.asarray(eps),
            )
            losses_j.append(float(lj))
        warm.step()  # reference steps the scheduler at epoch end

    np.testing.assert_allclose(losses_t, losses_j, atol=3e-4, rtol=3e-4)
    ours = export_torch_state_dict(model, params)
    want = _sd(rm)
    for k in ours:
        np.testing.assert_allclose(
            want[k], ours[k], atol=1e-5, rtol=1e-4,
            err_msg=f"12-step parameter divergence at {k}",
        )


def test_multistep_infodiff_training_trajectory_matches_reference(ref):
    """TEN consecutive optimizer steps of the FULL InfoDiff composite
    loss (denoise + recon + MMD + KLD, both regularizers) — per-step
    losses and final parameters vs the live torch loop on identical
    injected draws (t, eps, reparam, prior) with dropout off. This is
    the integrated-trajectory counterpart of the per-step loss/gradient/
    optimizer parity tests: schedule indexing, state threading, and
    roundoff accumulation across steps are what it adds.
    (Reference loop: run.py:188-212; loss: models.py:632-696.)"""
    import jax
    import jax.numpy as jnp
    import optax

    from infodiffusion_tpu.interop import export_torch_state_dict
    from infodiffusion_tpu.models import InfoDiff
    from infodiffusion_tpu.train.state import make_optimizer

    torch = ref.torch
    N_STEPS, LR = 10, 1e-3
    args = _args(mmd_weight=0.1, kld_weight=1e-3)
    # .eval() = dropout off, matching deterministic=True on our side
    rm = ref.models.InfoDiff(args, "cpu", shape=(1, SIZE, SIZE)).eval()

    model = InfoDiff(
        T=T, a_dim=A_DIM, shape=(1, SIZE, SIZE), unets_channels=CH,
        encoder_channels=CH, epochs=2, mmd_weight=0.1, kld_weight=1e-3,
    )
    v = _load(
        model,
        lambda: model.init(_rngs(), jnp.zeros((B, SIZE, SIZE, 1)), 0,
                           method=InfoDiff.loss_fn),
        _sd(rm),
    )
    params = v["params"]
    tx = make_optimizer(LR, epochs=2, steps_per_epoch=N_STEPS)
    opt_state = tx.init(params)
    opt = torch.optim.AdamW(rm.parameters(), lr=LR, weight_decay=1e-5)

    @jax.jit
    def our_step(params, opt_state, x, t_arr, eps, rep, prior):
        def loss_fn(p):
            loss, _aux = model.apply(
                {"params": p}, x, 0, method=InfoDiff.loss_fn,
                deterministic=True, t=t_arr, eps=eps,
                reparam_eps=rep, prior_samples=prior,
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(42)
    losses_t, losses_j = [], []
    for _ in range(N_STEPS):
        x = rng.randn(B, 1, SIZE, SIZE).astype(np.float32)
        t_arr = rng.randint(0, T, (B,)).astype(np.int64)
        eps = rng.randn(B, 1, SIZE, SIZE).astype(np.float32)
        rep = rng.randn(B, A_DIM).astype(np.float32)
        prior = rng.randn(B, A_DIM).astype(np.float32)

        opt.zero_grad()
        with _forced_draws(torch, t=t_arr, randn_arrays=[eps, rep, prior]):
            loss = rm.loss_fn(args, torch.from_numpy(x), curr_epoch=0)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(rm.parameters(), 1.0)
        opt.step()
        losses_t.append(float(loss.detach()))

        params, opt_state, lj = our_step(
            params, opt_state, jnp.asarray(_nhwc(x)), jnp.asarray(t_arr),
            jnp.asarray(_nhwc(eps)), jnp.asarray(rep), jnp.asarray(prior),
        )
        losses_j.append(float(lj))

    np.testing.assert_allclose(losses_t, losses_j, atol=5e-4, rtol=5e-4)
    ours = export_torch_state_dict(model, params)
    want = _sd(rm)
    dead = {k for k, p in rm.named_parameters() if p.grad is None}
    for k in ours:
        if k in dead:  # dead crossattn params never update on either side
            continue
        # Tolerance is a fraction of the Adam MOVEMENT BUDGET lr*N =
        # 1e-2: Adam normalizes every update to ~lr (Δθ = lr·m̂/√v̂), so
        # for params whose gradients sit near the f32 roundoff floor
        # (e.g. GN biases fed by the vanishing recon term) the
        # cross-framework grad differences are O(1) RELATIVE and the
        # normalized update direction itself wobbles — observed drift up
        # to 2.4e-4 (2.4% of budget) on such a bias at 10 steps, while
        # well-conditioned weights stay within ~3e-5. 5e-4 (5% of
        # budget) still catches every integration failure this test
        # exists for (wrong LR indexing, moment/decay bugs, state
        # threading); the per-step LOSS assertion above is the sharp
        # numeric pin.
        np.testing.assert_allclose(
            want[k], ours[k], atol=5e-4, rtol=1e-3,
            err_msg=f"10-step parameter divergence at {k}",
        )


def test_lr_schedule_matches_reference_scheduler(ref):
    """Per-epoch learning rates from the ACTUAL reference scheduler
    stack (GradualWarmupScheduler(multiplier=2, warm_epoch=1) wrapping
    CosineAnnealingLR(T_max=epochs), stepped once per epoch —
    run.py:182-185,209, utils.py:133-160) vs our warmup_cosine_schedule
    staircase.

    Under torch >= 2.x the chained stack does NOT produce the intended
    cosine: when the warmup hands over, it calls cos.get_lr() with
    cos.last_epoch == 0 outside a step, which lands in the RECURSIVE
    branch and multiplies by (1+cos(0))/(1+cos(-pi/T)) — a one-time
    overshoot that telescopes into the whole tail being the intended
    cosine scaled by 2/(1+cos(pi/T)) (+0.62% at T=20). Old torch (< 1.x
    recursion rework) returned base_lrs at last_epoch==0 and produced
    exactly the intended trace, which is what we implement. PARITY.md
    D18 documents the divergence; this test pins BOTH sides of it."""
    import math
    import sys as _sys

    from infodiffusion_tpu.train.state import warmup_cosine_schedule

    torch = ref.torch
    _sys.path.insert(0, REF)
    try:
        import utils as ref_utils
    finally:
        _sys.path.remove(REF)

    LR, EPOCHS, S = 1e-4, 20, 7  # 7 steps/epoch on our side
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=LR, weight_decay=1e-5)
    cos = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=EPOCHS, eta_min=0, last_epoch=-1
    )
    warm = ref_utils.GradualWarmupScheduler(
        opt, multiplier=2.0, warm_epoch=1, after_scheduler=cos
    )
    torch_lrs = []
    for _e in range(EPOCHS):
        torch_lrs.append(opt.param_groups[0]["lr"])  # lr used this epoch
        warm.step()  # reference steps at epoch end (run.py:209)

    sched = warmup_cosine_schedule(LR, EPOCHS, steps_per_epoch=S)
    ours = [float(sched(e * S)) for e in range(EPOCHS)]

    # warmup epochs agree exactly: base, then 2*base
    np.testing.assert_allclose(torch_lrs[:2], ours[:2], rtol=1e-6)
    # torch-2.x tail = intended tail * 2/(1+cos(pi/T)) (PARITY.md D18)
    warp = 2.0 / (1.0 + math.cos(math.pi / EPOCHS))
    np.testing.assert_allclose(
        torch_lrs[2:], [v * warp for v in ours[2:]], rtol=1e-5
    )
    # and our side IS the intended closed-form cosine on the doubled LR
    intended = [
        2 * LR * (1 + math.cos((e - 2) * math.pi / EPOCHS)) / 2
        for e in range(2, EPOCHS)
    ]
    np.testing.assert_allclose(ours[2:], intended, rtol=1e-5)
    # staircase: constant WITHIN each epoch (reference only steps the
    # scheduler at epoch boundaries)
    for e in range(EPOCHS):
        assert float(sched(e * S)) == float(sched((e + 1) * S - 1))


@pytest.mark.parametrize(
    "mmd_w,kld_w,use_C,curr_epoch",
    [
        (0.1, 0.0, False, 0),   # InfoVAE: recon from a_q + MMD(N, a_q)
        (0.0, 1e-3, False, 0),  # beta-VAE: batch-MEAN KLD
        (0.0, 1e-3, True, 1),   # beta-VAE + capacity control
    ],
)
def test_vae_composite_loss_matches_reference(
    ref, mmd_w, kld_w, use_C, curr_epoch
):
    import jax.numpy as jnp

    from infodiffusion_tpu.models import VAE

    torch = ref.torch
    args = _args(mmd_weight=mmd_w, kld_weight=kld_w, use_C=use_C,
                 model="vae")
    rm = ref.models.VAE(args, "cpu", shape=(1, SIZE, SIZE)).eval()

    model = VAE(a_dim=A_DIM, shape=(1, SIZE, SIZE), encoder_channels=CH,
                mmd_weight=mmd_w, kld_weight=kld_w, use_C=use_C,
                C_max=25.0, epochs=2)
    v = _load(
        model,
        lambda: model.init(_rngs(), jnp.zeros((B, SIZE, SIZE, 1)), 0,
                           method=VAE.loss_fn),
        _sd(rm),
    )
    rng = np.random.RandomState(14)
    x = rng.randn(B, 1, SIZE, SIZE).astype(np.float32)
    rep = rng.randn(B, A_DIM).astype(np.float32)
    prior = rng.randn(B, A_DIM).astype(np.float32)
    randn_arrays = [rep] + ([prior] if mmd_w != 0 else [])
    with torch.no_grad(), _forced_draws(torch, randn_arrays=randn_arrays):
        want = float(
            rm.loss_fn(args, torch.from_numpy(x), curr_epoch=curr_epoch)
        )
    loss, _aux = model.apply(
        {"params": v["params"]}, jnp.asarray(_nhwc(x)), curr_epoch,
        method=VAE.loss_fn, deterministic=True,
        reparam_eps=jnp.asarray(rep),
        prior_samples=(jnp.asarray(prior) if mmd_w != 0 else None),
    )
    np.testing.assert_allclose(want, float(loss), atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# Offline-metric oracles: the SAME latents/factors through the reference
# functions and ours (round-4 VERDICT item 7 — DCI was structure-tested
# but never numerically pinned; TAD pinned end-to-end here too).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_disent(ref):
    """The reference eval_disentanglement module (imports torch/sklearn
    and `from utils import ...`, both resolvable inside REF)."""
    sys.path.insert(0, REF)
    try:
        import eval_disentanglement as ref_ed
    finally:
        sys.path.remove(REF)
    return ref_ed


def test_dci_matches_reference_function(ref_disent):
    """compute_dci on identical inputs: sklearn's default
    GradientBoostingClassifier is deterministic (subsample=1.0, all
    features), so every score must agree to f64 roundoff
    (reference: eval_disentanglement.py:88-150)."""
    from infodiffusion_tpu.metrics import compute_dci

    rng = np.random.RandomState(42)
    n_codes, n_factors, n = 5, 3, 150
    codes_tr = rng.randn(n_codes, n)
    codes_te = rng.randn(n_codes, n // 2)
    # factors driven by individual codes so the trees find structure
    ys_tr = np.stack([(codes_tr[i] > 0).astype(int) + (codes_tr[i] > 1)
                      for i in range(n_factors)])
    ys_te = np.stack([(codes_te[i] > 0).astype(int) + (codes_te[i] > 1)
                      for i in range(n_factors)])
    want = ref_disent.compute_dci(codes_tr, ys_tr, codes_te, ys_te)
    got = compute_dci(codes_tr, ys_tr, codes_te, ys_te)
    for key in ("disentanglement", "completeness",
                "informativeness_train", "informativeness_test"):
        np.testing.assert_allclose(
            got[key], want[key], atol=1e-10, err_msg=key
        )
    np.testing.assert_allclose(got["importance"], want["importance"],
                               atol=1e-10)


def test_tad_matches_reference_evaluate(ref_disent):
    """TADMetric.evaluate end-to-end on identical inputs: score,
    captured-attribute count, and the full AUROC grid (our vectorized
    Mann-Whitney grid + matmul MI vs the reference's torch loops;
    reference: eval_disentanglement.py:236-363)."""
    from infodiffusion_tpu.metrics import TADMetric

    rng = np.random.RandomState(7)
    n, a_dim, y_dim = 400, 6, 5
    a = rng.randn(n, a_dim).astype(np.float32)
    y = np.zeros((n, y_dim), dtype=np.int64)
    y[:, 0] = a[:, 0] > 0          # cleanly captured by latent 0
    y[:, 1] = a[:, 1] + 0.3 * rng.randn(n) > 0   # noisier detector
    y[:, 2] = y[:, 0] ^ (rng.rand(n) < 0.05)     # MI-redundant with y0
    y[:, 3] = rng.rand(n) < 0.5    # pure noise attribute
    y[:, 4] = (a[:, 2] + a[:, 3]) > 0            # entangled pair
    names = [f"attr{i}" for i in range(y_dim)]
    want_score, want_grid, want_k = ref_disent.TADMetric(
        y_dim, names
    ).evaluate(a, y)
    got_score, got_grid, got_k = TADMetric(y_dim, names).evaluate(a, y)
    np.testing.assert_allclose(got_grid, want_grid, atol=1e-5)
    assert got_k == want_k
    np.testing.assert_allclose(got_score, want_score, atol=1e-5)
