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
