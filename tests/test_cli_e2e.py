"""End-to-end CLI integration tests on synthetic data + tiny configs
(SURVEY.md §4.3): train -> checkpoint -> eval artifacts, the latent-DDIM
pipeline, and the FID stats/score tooling."""

import json
import os

import numpy as np
import pytest

from infodiffusion_tpu.cli import dispatch, parse_args


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("INFODIFF_SYNTHETIC_DATA", "1")
    monkeypatch.setenv("INFODIFF_SYNTHETIC_N", "48")
    return tmp_path


def _args(extra):
    base = [
        "--model", "vanilla", "--mode", "train", "--prior", "regular",
        "--a_dim", "8", "--dataset", "mnist", "--epochs", "1",
        "--batch_size", "16", "--diffusion_steps", "6", "--save_epochs", "1",
        "--data_dir", "synthetic", "--sampling_number", "4",
    ]
    out = dict(zip(base[::2], base[1::2]))
    out.update(dict(zip(extra[::2], extra[1::2])))
    flat = []
    for k, v in out.items():
        flat += [k, v]
    return flat


def test_train_latent_ddim_pipeline(workdir):
    """npz latents -> train_latent_ddim -> checkpoint under {exp}_latent
    (reference: run.py:482-526)."""
    a = np.random.RandomState(0).randn(64, 8).astype(np.float32)
    np.savez("diff_mnist_8d_0_1mmd_latent", all_a=a, all_attr=np.zeros(64))
    cfg = parse_args(_args([
        "--model", "diff", "--mode", "train_latent_ddim",
    ]))
    dispatch(cfg)
    assert os.path.isdir("models/mnist_8d_0.1mmd_latent/model-1")
    # resume path finds it
    from infodiffusion_tpu.train import latest_checkpoint_epoch

    assert latest_checkpoint_epoch(
        os.path.abspath("models/mnist_8d_0.1mmd_latent")
    ) == 1


@pytest.mark.slow
def test_vanilla_train_then_eval(workdir):
    """train 1 epoch -> eval mode produces sample PNGs
    (reference: run.py:161-212, 256-264). Shallow ch_mult override keeps
    the CPU compile tractable; the deep default path is exercised on the
    real TPU by bench.py/__graft_entry__."""
    cfg = parse_args(_args(["--ch_mult", "1,2", "--attn", "1"]))
    dispatch(cfg)
    assert os.path.isdir("models/diff/mnist_8d_0.1mmd/model-1")

    cfg = parse_args(_args(["--mode", "eval", "--epochs", "1",
                            "--ch_mult", "1,2", "--attn", "1"]))
    dispatch(cfg)
    evaldir = "imgs/diff/mnist_8d_0.1mmd/eval"
    assert os.path.isdir(evaldir) and len(os.listdir(evaldir)) >= 1

    # save_original_img: dataset dump for FID stats (reference:
    # run.py:540-549 — one grid PNG per batch)
    dispatch(parse_args(_args(["--mode", "save_original_img"])))
    assert len(os.listdir("mnist_imgs")) == 3  # 48 synthetic / batch 16


def test_metrics_writer_jsonl(workdir):
    from infodiffusion_tpu.logging_utils import MetricsWriter

    w = MetricsWriter(str(workdir / "logs"))
    w.write(1, {"loss": 0.5})
    w.close()
    rec = json.loads(open(workdir / "logs" / "metrics.jsonl").read().strip())
    assert rec["train/loss"] == 0.5 and rec["step"] == 1


def test_fid_pipeline_random_extractor(workdir, tmp_path, monkeypatch):
    """make_custom_stats + compute_fid/kid with the fallback extractor:
    same-distribution folders score ~0, disjoint ones score higher."""
    from PIL import Image

    from infodiffusion_tpu.metrics import fid as fidmod

    rng = np.random.RandomState(0)
    real = tmp_path / "real"
    fake_same = tmp_path / "same"
    fake_diff = tmp_path / "diff"
    for d in (real, fake_same, fake_diff):
        d.mkdir()
    for i in range(24):
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            real / f"{i}.png")
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            fake_same / f"{i}.png")
        Image.fromarray(
            np.full((64, 64, 3), (i * 10) % 255, dtype=np.uint8)).save(
            fake_diff / f"{i}.png")

    monkeypatch.setenv("INFODIFF_FID_STATS_DIR", str(tmp_path / "stats"))
    fidmod.make_custom_stats("synth", str(real), extractor="random")
    f_same = fidmod.compute_fid(str(fake_same), "synth", extractor="random")
    f_diff = fidmod.compute_fid(str(fake_diff), "synth", extractor="random")
    assert f_diff > f_same
    k_same = fidmod.compute_kid(str(fake_same), "synth", extractor="random")
    k_diff = fidmod.compute_kid(str(fake_diff), "synth", extractor="random")
    assert k_diff > k_same


def test_eval_disentanglement_protocol(workdir):
    """5-fold protocol prints and returns sane scores on synthetic
    aligned latents (reference: eval_disentanglement.py:419-476)."""
    from infodiffusion_tpu.eval_disentanglement import evaluate_latents

    rng = np.random.RandomState(0)
    n = 300
    y = (rng.rand(n, 40) > 0.5).astype(np.int64)
    a = np.concatenate([y[:, :8] + 0.05 * rng.randn(n, 8),
                        rng.randn(n, 8)], axis=1)
    out = evaluate_latents(a, y, "celeba", verbose=False)
    assert "tad" in out and "linear_probe" in out
    assert out["linear_probe"][0] > 0.6


@pytest.mark.slow
def test_infodiff_full_latent_pipeline(workdir):
    """The flagship 4-step workflow (reference: eval_fid.sh): train ->
    save_latent -> train_latent_ddim -> eval_fid --is_latent, then
    disentangle + interpolate on the same checkpoint. Uses the ch_mult
    override to keep CPU compiles tractable."""
    common = [
        "--model", "diff", "--prior", "regular", "--a_dim", "4",
        "--dataset", "mnist", "--epochs", "1", "--batch_size", "16",
        "--diffusion_steps", "6", "--save_epochs", "1",
        "--data_dir", "synthetic", "--ch_mult", "1,2", "--attn", "1",
        "--mmd_weight", "0.1", "--deterministic",
    ]
    dispatch(parse_args(common + ["--mode", "train"]))
    assert os.path.isdir("models/mnist_4d_0.1mmd/model-1")

    dispatch(parse_args(common + ["--mode", "save_latent"]))
    assert os.path.exists("diff_mnist_4d_0_1mmd_latent.npz")
    lat = np.load("diff_mnist_4d_0_1mmd_latent.npz")
    assert lat["all_a"].shape == (48, 4)
    assert lat["all_attr"].shape[0] == 48

    dispatch(parse_args(common + ["--mode", "train_latent_ddim"]))
    assert os.path.isdir("models/mnist_4d_0.1mmd_latent/model-1")

    dispatch(parse_args(common + [
        "--mode", "eval_fid", "--is_latent", "--sampling_number", "4",
        "--batch_size", "4",
    ]))
    fid_dir = "imgs/mnist_4d_0.1mmd/eval-fid-latent"
    assert len(os.listdir(fid_dir)) == 4

    dispatch(parse_args(common + ["--mode", "disentangle"]))
    dis_dir = "imgs/mnist_4d_0.1mmd/disentangle-0"
    assert len(os.listdir(dis_dir)) == 4  # one traversal row per latent dim

    dispatch(parse_args(common + ["--mode", "interpolate"]))
    int_dir = "imgs/mnist_4d_0.1mmd/interpolate-0"
    assert len(os.listdir(int_dir)) == 1

    # extension mode: working attribute classification over the latents
    dispatch(parse_args(common + ["--mode", "attr_classification"]))
    assert os.path.exists(
        "imgs/mnist_4d_0.1mmd/attr_classification/results.json"
    )

    # plot_latent: 2-D scatter of latents (reference: run.py:342-370)
    dispatch(parse_args(common + ["--mode", "plot_latent"]))
    assert os.path.exists("imgs/mnist_4d_0.1mmd/plot_latent/plot_latent.png")

    # latent_quality: fixed a, fresh xT draws (reference: run.py:310-341;
    # batch forced to 1, sampling_number tiles)
    dispatch(parse_args(common + [
        "--mode", "latent_quality", "--sampling_number", "3",
    ]))
    lq = "imgs/mnist_4d_0.1mmd/latent_quality"
    assert len(os.listdir(lq)) == 3

    # two-phase eval_fid (without --is_latent): needs a separately
    # trained vanilla UNet at models/diff/{dataset}_{a_dim}d
    # (reference: run.py:245-251, 280)
    vanilla = [a for a in common]
    vanilla[vanilla.index("diff")] = "vanilla"
    mi = vanilla.index("--mmd_weight")
    vanilla[mi + 1] = "0"
    dispatch(parse_args(vanilla + ["--mode", "train"]))
    assert os.path.isdir("models/diff/mnist_4d/model-1")
    dispatch(parse_args(common + [
        "--mode", "eval_fid", "--sampling_number", "4",
        "--batch_size", "4", "--split_step", "3",
    ]))
    fid2 = "imgs/mnist_4d_0.1mmd/eval-fid-fast"
    assert len(os.listdir(fid2)) == 4


@pytest.mark.slow
def test_vae_train_eval_disentangle(workdir):
    """VAE family e2e: train -> eval (decode prior draws) -> disentangle
    (decoder traversal) (reference: run.py:261-264, 410-414)."""
    common = [
        "--model", "vae", "--prior", "regular", "--a_dim", "4",
        "--dataset", "mnist", "--epochs", "1", "--batch_size", "16",
        "--save_epochs", "1", "--data_dir", "synthetic",
        "--ch_mult", "1,2", "--attn", "1", "--mmd_weight", "0.1",
    ]
    dispatch(parse_args(common + ["--mode", "train"]))
    assert os.path.isdir("models/vae/mnist_4d_0.1mmd/model-1")
    dispatch(parse_args(common + ["--mode", "eval", "--sampling_number", "4"]))
    assert os.listdir("imgs/vae/mnist_4d_0.1mmd/eval")
    dispatch(parse_args(common + ["--mode", "disentangle"]))
    assert len(os.listdir("imgs/vae/mnist_4d_0.1mmd/disentangle-0")) == 4


def test_save_latent_bf16_npz_is_float32(workdir):
    """--bf16 must not leak bfloat16 into the latent npz (numpy would
    pickle it as objects and train_latent_ddim would crash)."""
    common = [
        "--model", "diff", "--prior", "regular", "--a_dim", "4",
        "--dataset", "mnist", "--epochs", "1", "--batch_size", "16",
        "--diffusion_steps", "6", "--save_epochs", "1",
        "--data_dir", "synthetic", "--ch_mult", "1,2", "--attn", "1",
        "--mmd_weight", "0.1", "--bf16",
    ]
    dispatch(parse_args(common + ["--mode", "train"]))
    dispatch(parse_args(common + ["--mode", "save_latent"]))
    lat = np.load("diff_mnist_4d_0_1mmd_latent.npz")
    assert lat["all_a"].dtype == np.float32
    # and the latent DDIM trains from it
    dispatch(parse_args(common + ["--mode", "train_latent_ddim"]))
    assert os.path.isdir("models/mnist_4d_0.1mmd_latent/model-1")


@pytest.mark.slow
def test_train_with_tensor_parallel_flag(workdir):
    """--tp 2 on the 8-device mesh: (data=4, model=2), conv weights
    sharded on output features; training completes and checkpoints
    (new capability — the reference is single-device, SURVEY.md 2.3)."""
    cfg = parse_args(_args(["--ch_mult", "1,2", "--attn", "1",
                            "--tp", "2"]))
    assert cfg.tp == 2
    dispatch(cfg)
    assert os.path.isdir("models/diff/mnist_8d_0.1mmd/model-1")


@pytest.mark.slow
def test_eval_profiler_hook(workdir, monkeypatch):
    """INFODIFF_PROFILE on an eval mode captures an xprof trace dir
    (SURVEY.md §5: the reference has no tracing anywhere)."""
    cfg = parse_args(_args(["--ch_mult", "1,2", "--attn", "1"]))
    dispatch(cfg)
    monkeypatch.setenv("INFODIFF_PROFILE", str(workdir / "trace"))
    cfg = parse_args(_args(["--mode", "eval", "--epochs", "1",
                            "--ch_mult", "1,2", "--attn", "1"]))
    dispatch(cfg)
    import glob

    assert glob.glob(str(workdir / "trace" / "**" / "*.xplane.pb"),
                     recursive=True)


def test_plot_latent_string_attrs(workdir, monkeypatch):
    """plot_latent on attr-less datasets (chairs/ffhq): _encode_dataset
    fills "No Attributes" strings (runner.py:_encode_dataset) — the mode
    must fall back to a single class instead of crashing on
    labels.astype(float) (round-1 VERDICT weak #5)."""
    from infodiffusion_tpu import runner
    from infodiffusion_tpu.config import Config

    rng = np.random.RandomState(0)
    a = rng.randn(24, 4).astype(np.float32)
    attrs = np.full((24,), "No Attributes", dtype=object)
    monkeypatch.setattr(
        runner, "_encode_dataset", lambda cfg, model, variables: (a, attrs)
    )
    cfg = Config(model="diff", mode="plot_latent", prior="regular",
                 a_dim=4, dataset="chairs", mmd_weight=0.1)
    path = runner._mode_plot_latent(cfg, None, None)
    assert os.path.exists(path)


def test_train_latent_ddim_pp(workdir):
    """--pp 2: CLI-driven GPipe-pipelined latent training on the virtual
    multi-device mesh (round-2 VERDICT #4) — checkpoint lands in the
    same layout as the sequential path."""
    a = np.random.RandomState(0).randn(64, 8).astype(np.float32)
    np.savez("diff_mnist_8d_0_1mmd_latent", all_a=a, all_attr=np.zeros(64))
    cfg = parse_args(_args([
        "--model", "diff", "--mode", "train_latent_ddim", "--pp", "2",
    ]))
    dispatch(cfg)
    assert os.path.isdir("models/mnist_8d_0.1mmd_latent/model-1")


def test_pp_rejects_image_training(workdir):
    cfg = parse_args(_args(["--model", "diff", "--pp", "2"]))
    with pytest.raises(ValueError, match="train_latent_ddim"):
        dispatch(cfg)


def test_evaluate_wiring_sp_mesh_and_lazy_process(workdir, monkeypatch):
    """evaluate() must (a) not build a sampler for modes that never run
    one — under --turbo the DiffusionProcess constructor runs a
    calibration forward, a cold-compile-scale cost over the TPU tunnel —
    and (b) hand eval_fid the --sp-guarded mesh instead of letting it
    rebuild the full-device 'data' mesh while the ring-attention 'seq'
    mesh is armed (jit rejects mixed device sets)."""
    from infodiffusion_tpu import runner
    from infodiffusion_tpu.parallel.sp import configure_sp

    monkeypatch.setattr(
        runner, "_build_eval",
        lambda c: (c.with_dataset_config(), None, None),
    )

    class Boom:
        def __init__(self, *a, **k):
            raise AssertionError(
                "DiffusionProcess built for a non-sampling mode"
            )

    monkeypatch.setattr(runner, "DiffusionProcess", Boom)
    seen = {}

    def fake_run(cfg, model, variables, process, mesh, rng):
        seen["mesh"] = mesh
        seen["process"] = process

    monkeypatch.setattr(runner, "_run_eval_mode", fake_run)

    try:
        runner.evaluate(parse_args(_args([
            "--model", "diff", "--mode", "save_latent",
        ])))
        assert seen["process"] is None

        with pytest.warns(UserWarning, match="will never engage"):
            runner.evaluate(parse_args(_args([
                "--model", "diff", "--mode", "eval_fid", "--sp", "2",
            ])))
        assert seen["mesh"] is None
    finally:
        configure_sp(None)
