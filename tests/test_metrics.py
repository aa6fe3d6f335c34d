"""Disentanglement metric tests (DCI / TAD / linear probe) on synthetic
latents with known structure."""

import numpy as np
import pytest

from infodiffusion_tpu.metrics import PredMetric, TADMetric, compute_dci
from infodiffusion_tpu.metrics.disentanglement import (
    _binary_mi_matrix,
    completeness,
    disentanglement,
)


def test_disentanglement_perfect_importance():
    # one code per factor -> perfect disentanglement/completeness
    imp = np.eye(4)
    assert disentanglement(imp) == pytest.approx(1.0)
    assert completeness(imp) == pytest.approx(1.0)
    # uniform importance -> 0
    imp = np.ones((4, 4)) / 4
    assert disentanglement(imp) == pytest.approx(0.0, abs=1e-9)


def test_binary_mi_matrix_matches_loop_oracle():
    rng = np.random.RandomState(0)
    y = (rng.rand(200, 5) > 0.5).astype(int)

    def mi_pair(yi, yj):
        total = 0.0
        for vi in (0, 1):
            for vj in (0, 1):
                jp = np.mean((yi == vi) & (yj == vj))
                pi = np.mean(yi == vi)
                pj = np.mean(yj == vj)
                if jp > 0 and pi > 0 and pj > 0:
                    total += jp * np.log(jp / (pi * pj))
        return total

    got = _binary_mi_matrix(y)
    for i in range(5):
        for j in range(5):
            assert got[i, j] == pytest.approx(mi_pair(y[:, i], y[:, j]),
                                              abs=1e-9)


def test_tad_detects_aligned_latents():
    """Latent dim j perfectly predicts attribute j -> TAD captures all
    attributes with margin ~= 0.5 each."""
    rng = np.random.RandomState(1)
    n, d = 400, 4
    y = (rng.rand(n, d) > 0.5).astype(int)
    a = y + 0.01 * rng.randn(n, d)  # aligned codes
    a = np.concatenate([a, rng.randn(n, 2)], axis=1)  # nuisance dims
    tad = TADMetric(d, [f"attr{i}" for i in range(d)])
    score, auroc, num = tad.evaluate(a, y)
    assert num == d
    assert score > d * 0.3
    assert auroc.shape == (d, d + 2)
    # unaligned latents: near-random detectors -> nothing captured
    score0, _, num0 = tad.evaluate(rng.randn(n, d + 2), y)
    assert num0 == 0 and score0 == 0.0


def test_dci_identifies_structure():
    rng = np.random.RandomState(2)
    n = 300
    factors = rng.randint(0, 3, size=(2, n))
    codes = np.concatenate(
        [factors + 0.01 * rng.randn(2, n), rng.randn(1, n)], axis=0
    )
    res = compute_dci(codes[:, :200], factors[:, :200],
                      codes[:, 200:], factors[:, 200:])
    assert res["disentanglement"] > 0.8
    assert res["informativeness_test"] > 0.9


def test_pred_metric_linear_auroc():
    rng = np.random.RandomState(3)
    n = 400
    a = rng.randn(n, 6)
    y = (a[:, :2] + 0.1 * rng.randn(n, 2) > 0).astype(int)
    pm = PredMetric("Linear", "b")
    res = pm.evaluate(a[:300], y[:300], a[300:], y[300:])
    assert res["Linear_avg_result"] > 0.95


def test_dsprites_eval_protocol(tmp_path, monkeypatch):
    """--dataset dsprites path of the disentanglement CLI: labels come
    from the latents_classes half of the attr block, the constant color
    factor is dropped (names table matches), and latents that encode
    the factors perfectly score near-ceiling DCI."""
    from infodiffusion_tpu.eval_disentanglement import (
        ATTR_TABLES, evaluate_latents, load_latents,
    )

    rng = np.random.RandomState(0)
    n = 400
    classes = np.stack(
        [
            np.zeros(n),                      # color: constant
            rng.randint(0, 3, n),             # shape
            rng.randint(0, 6, n),             # scale
            rng.randint(0, 40, n),            # orientation
            rng.randint(0, 32, n),            # posX
            rng.randint(0, 32, n),            # posY
        ],
        axis=1,
    )
    vals = classes.astype(np.float64)
    attrs = np.concatenate([vals, classes], axis=1)
    # latents = one factor per dim (perfectly disentangled) + noise dims
    a = np.concatenate(
        [classes[:, 1:].astype(np.float64), rng.randn(n, 3)], axis=1
    )
    path = str(tmp_path / "diff_x_latent.npz")
    np.savez(path, all_a=a, all_attr=attrs)

    la, y = load_latents(None, "dsprites", npz_path=path)
    assert y.shape == (n, 5)                      # color dropped
    assert len(ATTR_TABLES["dsprites"][0]) == 5   # names match
    out = evaluate_latents(la, y, "dsprites", verbose=False)
    dci_mean, _dci_std = out["dci"]
    assert dci_mean > 0.8                         # near-ceiling
    acc_mean, _ = out["linear_probe"]
    # mean over factors incl. 40-class orientation with only 320 train
    # rows — well above the ~0.1 chance mean but not near 1
    assert acc_mean > 0.4


def test_pred_metric_degenerate_fold_scores_chance():
    """A train fold with a single class for some attribute must score
    chance/majority instead of crashing (predict_proba has one column,
    AUROC undefined) — the PredMetric counterpart of TAD's constant-attr
    guard."""
    from infodiffusion_tpu.metrics.disentanglement import PredMetric

    rng = np.random.RandomState(0)
    codes_tr, codes_te = rng.randn(40, 4), rng.randn(20, 4)
    ok = (codes_tr[:, 0] > 0).astype(np.int64)
    ok_te = (codes_te[:, 0] > 0).astype(np.int64)
    const = np.zeros(40, np.int64)
    const_te = np.zeros(20, np.int64)
    attrs_tr = np.stack([ok, const], axis=1)
    attrs_te = np.stack([ok_te, const_te], axis=1)

    res_b = PredMetric("Linear", "b", ["ok", "const"]).evaluate(
        codes_tr, attrs_tr, codes_te, attrs_te
    )
    assert res_b["Linear_result"][0] > 0.9   # learnable attr still scored
    assert res_b["Linear_result"][1] == 0.5  # degenerate -> chance

    res_c = PredMetric("Linear", "c", ["ok", "const"]).evaluate(
        codes_tr, attrs_tr, codes_te, attrs_te
    )
    assert res_c["Linear_result"][1] == 1.0  # majority class everywhere


def test_load_latents_attrless_dump_raises_clear_error(tmp_path):
    """save_latent writes the string 'No Attributes' for label-less
    datasets; the disentanglement loader must explain that instead of
    failing in astype/indexing."""
    import pytest

    from infodiffusion_tpu.eval_disentanglement import load_latents

    path = str(tmp_path / "diff_chairs_latent.npz")
    np.savez(
        path,
        all_a=np.random.RandomState(0).randn(8, 4),
        all_attr=np.array(["No Attributes"] * 8),
    )
    with pytest.raises(ValueError, match="no usable labels"):
        load_latents(None, "chairs", npz_path=path)


def test_eval_disentanglement_cli_accepts_3dshapes(tmp_path, monkeypatch):
    """--dataset 3dshapes is this tool's own extension (label transforms
    exist for it) even though the training CLI has no 3dshapes loader."""
    monkeypatch.chdir(tmp_path)
    from infodiffusion_tpu.eval_disentanglement import main

    rng = np.random.RandomState(0)
    # factors in the raw [0,1]-ish ranges the transforms expect; Shape
    # (col 4) is untransformed and must already be integral 0..3 like
    # the real dataset
    y = rng.rand(64, 6)
    y[:, 4] = rng.randint(0, 4, 64)
    y[:, 5] = rng.rand(64) * 60  # raw orientation spans 0..60
    a = np.concatenate([y, rng.randn(64, 2)], axis=1)
    np.savez("diff_3dshapes_32d_0_1mmd_latent.npz", all_a=a, all_attr=y)
    out = main([
        "--model", "diff", "--prior", "regular", "--dataset", "3dshapes",
        "--a_dim", "32", "--mmd_weight", "0.1",
    ])
    assert "dci" in out and "linear_probe" in out


def test_iter_folder_native_size_batching(tmp_path):
    """res=None keeps native sizes (clean-fid semantics: the extractor's
    299 resize is the only resample), flushing the batch when the size
    changes; an integer res pre-resizes."""
    from PIL import Image

    from infodiffusion_tpu.metrics.fid import _iter_folder

    for i, size in enumerate([32, 32, 48]):
        Image.new("RGB", (size, size), (i, 0, 0)).save(
            tmp_path / f"{i}.png"
        )
    batches = list(_iter_folder(str(tmp_path), None, batch=8))
    assert [b.shape for b in batches] == [(2, 32, 32, 3), (1, 48, 48, 3)]
    batches64 = list(_iter_folder(str(tmp_path), 64, batch=8))
    assert [b.shape for b in batches64] == [(3, 64, 64, 3)]


def test_aurocs_search_vectorized_matches_sklearn_loop():
    """The Mann-Whitney midrank grid must equal the reference-style
    per-pair sklearn loop exactly, including tied scores, degenerate
    (constant) attributes, and non-{0,1} binary labels (round-4 VERDICT
    item 8)."""
    rng = np.random.RandomState(3)
    n, a_dim, y_dim = 120, 7, 5
    a = rng.randn(n, a_dim)
    a[:, 2] = np.round(a[:, 2])  # heavy ties -> midrank handling
    a[:, 5] = 0.0                # constant latent column
    y = np.zeros((n, y_dim))
    y[:, 0] = a[:, 0] > 0
    y[:, 1] = rng.rand(n) < 0.3
    y[:, 2] = 1.0                # degenerate attribute -> 0.5 row
    y[:, 3] = np.where(a[:, 1] > 0.5, 2.0, -1.0)  # labels {-1, 2}
    y[:, 4] = a[:, 2] > 0
    tad = TADMetric(y_dim, [f"t{i}" for i in range(y_dim)])
    got = tad.aurocs_search(a, y)
    want = tad.aurocs_search_sklearn(a, y)
    np.testing.assert_allclose(got, want, atol=1e-12)
    assert np.all(got[2] == 0.5)
