"""Pure decision logic of the round-4 measurement tools.

The tools themselves are hardware scripts (tools/qconv_bench.py,
tools/latent_turbo_bench.py, tools/turbo_fid_delta.py) — their timing
loops only mean something on the TPU. What IS testable is the logic
that turns timings into claims: the site filter (a typo must not
produce a vacuously-successful empty run), the significance rule (a
delta inside the run-to-run spread must never be reported as a win —
the exact failure mode that produced round 3's phantom +1.3% latent
gain), and the FID-invariance verdict (PARITY.md D16's metric-level
bound)."""

import importlib.util
import os
import sys

import jax
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _load(name):
    """Import a tools/ script, restoring the suite's CPU compile-cache
    dir afterwards (the tools repoint it at import, like bench.py —
    see test_scripts)."""
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(TOOLS, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    cache_dir = jax.config.jax_compilation_cache_dir
    try:
        spec.loader.exec_module(mod)
    finally:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    return mod


@pytest.fixture(scope="module")
def qcb():
    return _load("qconv_bench")


@pytest.fixture(scope="module")
def ltb():
    return _load("latent_turbo_bench")


def test_site_filter_default_and_subset(qcb):
    assert qcb.select_sites(qcb.SITES, None) == list(qcb.SITES)
    assert qcb.select_sites(qcb.SITES, "") == list(qcb.SITES)
    got = qcb.select_sites(qcb.SITES, "l0_up_pieces,l1_up_pieces")
    assert [s[0] for s in got] == ["l0_up_pieces", "l1_up_pieces"]


def test_site_filter_rejects_typos(qcb):
    with pytest.raises(SystemExit, match="l0_covn"):
        qcb.select_sites(qcb.SITES, "l0_covn")
    # a filter that would select nothing must not yield a silent no-op
    with pytest.raises(SystemExit):
        qcb.select_sites(qcb.SITES, "nope")


def test_significance_rule(ltb):
    # delta inside the summed spreads = noise, not a win
    assert not ltb.significant(33.68, 33.57, 1.16, 1.92)
    assert not ltb.significant(75.16, 74.20, 2.32, 1.04)
    # a real difference (trajectory-kernel-sized) is significant
    assert ltb.significant(90.3, 76.6, 2.0, 2.0)
    assert ltb.significant(76.6, 90.3, 2.0, 2.0)  # symmetric
    # boundary: exactly at the summed spreads is NOT significant
    assert not ltb.significant(10.0, 9.0, 0.5, 0.5)


def test_measure_median_and_spread(ltb):
    """measure() must report the median and the middle-half spread of
    the per-rep seconds (not mean/min — the tunnel's tail is fat)."""
    import jax.numpy as jnp
    import jax.random as jr

    times = iter([0.0, 1.0, 1.0, 3.0, 1.1, 4.1, 1.2, 5.2, 1.3, 6.3])
    med, spread = ltb.measure(
        lambda k: jnp.zeros(()), jr.PRNGKey(0), 5, clock=lambda: next(times)
    )
    # per-rep durations: 1.0, 2.0, 3.0, 4.0, 5.0
    assert med == pytest.approx(3.0)
    assert spread == pytest.approx(2.0)  # middle half = [2.0, 3.0, 4.0]


def test_fid_tier_verdict():
    sys.path.insert(0, TOOLS)
    try:
        from turbo_fid_delta import tier_verdict
    finally:
        sys.path.remove(TOOLS)
    # within 3% of the bf16 score = invariant (fallback floor ~0)
    assert tier_verdict(1.0, 100.0, 0.0) == "fid_invariant"
    assert tier_verdict(3.0, 100.0, -0.0002) == "fid_invariant"
    assert tier_verdict(10.0, 100.0, 0.0) == "fid_divergent"
    # a large real-vs-real floor (true-Inception regime) widens the bound
    assert tier_verdict(4.0, 100.0, 0.5) == "fid_invariant"
