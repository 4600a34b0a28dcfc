"""Misra-Gries + t-digest kernel tests (no Spark) — reference contracts."""

import numpy as np
import pytest

from datasketches_rust_spark.sigkit.frequencies import EPSILON_FACTOR, MisraGries
from datasketches_rust_spark.sigkit.tdigest import TDigest


def _zipf_stream(n, seed=1):
    rng = np.random.default_rng(seed)
    return (rng.zipf(1.5, size=n) % 1000).astype(str)


# ----------------------------------------------------------------- MG

def test_mg_exact_mode():
    """Map larger than distinct count → exact counts, zero error."""
    s = MisraGries(64)
    items = np.array(["a"] * 50 + ["b"] * 30 + ["c"] * 5, dtype=object)
    s.update_batch(items)
    assert s.offset == 0
    assert s.lower_bound() == {"a": 50, "b": 30, "c": 5}
    assert s.frequent_items(threshold=20) == [("a", 50), ("b", 30)]


def test_mg_error_contract():
    """(UB - LB) = offset <= W * 3.5 / M (frequencies/sketch.rs:43, :212-214)."""
    stream = _zipf_stream(200_000)
    m = 128
    s = MisraGries(m)
    for chunk in np.array_split(stream, 40):
        s.update_batch(chunk)
    assert s.stream_weight == len(stream)
    assert s.maximum_error() <= len(stream) * EPSILON_FACTOR / m
    # true heavy hitters must survive with UB >= true count (no false negatives)
    vals, counts = np.unique(stream, return_counts=True)
    exact = dict(zip(vals.tolist(), counts.tolist()))
    lb = s.lower_bound()
    for item, true_count in exact.items():
        if true_count > 2 * s.maximum_error():
            assert item in lb
            assert lb[item] <= true_count <= lb[item] + s.offset


def test_mg_merge_matches_single_stream():
    stream = _zipf_stream(100_000, seed=3)
    parts = np.array_split(stream, 7)
    merged = MisraGries(128)
    for p in parts:
        s = MisraGries(128)
        s.update_batch(p)
        merged.merge(s)
    assert merged.stream_weight == len(stream)
    assert merged.maximum_error() <= len(stream) * EPSILON_FACTOR / 128
    vals, counts = np.unique(stream, return_counts=True)
    top = vals[np.argmax(counts)]
    lb = merged.lower_bound()
    assert top in lb and lb[top] <= counts.max() <= lb[top] + merged.offset


# ----------------------------------------------------------------- t-digest

def test_tdigest_quantile_accuracy():
    rng = np.random.default_rng(5)
    vals = rng.lognormal(0, 1, size=100_000)
    d = TDigest(200)
    for chunk in np.array_split(vals, 20):
        d.update_batch(chunk)
    exact = np.quantile(vals, [0.01, 0.25, 0.5, 0.75, 0.99])
    for q, e in zip([0.01, 0.25, 0.5, 0.75, 0.99], exact):
        got = d.quantile(q)
        # rank-error check: the true rank of the returned value is near q
        true_rank = (vals <= got).mean()
        assert abs(true_rank - q) < 0.02, (q, got, e, true_rank)
    assert len(d.means) <= 2 * 200  # compression bound ~O(delta)


def test_tdigest_merge_close_to_single():
    rng = np.random.default_rng(6)
    vals = rng.normal(0, 1, size=50_000)
    parts = np.array_split(vals, 9)
    merged = TDigest(200)
    for p in parts:
        d = TDigest(200)
        d.update_batch(p)
        merged.merge(d)
    assert merged.total_weight == pytest.approx(len(vals))
    for q in (0.1, 0.5, 0.9):
        true_rank = (vals <= merged.quantile(q)).mean()
        assert abs(true_rank - q) < 0.02


def test_tdigest_nan_inf_ignored_and_edge():
    d = TDigest(100)
    d.update_batch(np.array([1.0, np.nan, np.inf, -np.inf, 3.0]))
    assert d.total_weight == 2
    assert d.quantile(0.0) == 1.0
    assert d.quantile(1.0) == 3.0
    empty = TDigest(100)
    assert np.isnan(empty.quantile(0.5))


def test_tdigest_cdf_pmf():
    rng = np.random.default_rng(11)
    vals = rng.normal(0, 1, size=50_000)
    d = TDigest(200)
    d.update_batch(vals)
    sp = np.array([-2.0, -1.0, 0.0, 1.0, 2.0])
    c = d.cdf(sp)
    assert np.all(np.diff(c) >= 0)
    for s, got in zip(sp, c):
        assert abs(got - (vals <= s).mean()) < 0.02
    p = d.pmf(sp)
    assert len(p) == len(sp) + 1
    assert p.sum() == pytest.approx(1.0)
    assert np.all(p >= 0)


def test_tdigest_exact_mode_singletons():
    """delta >> pi*n: no merging, quantile == midpoint interpolation of
    the raw order statistics (the driver's oracle-matched config)."""
    rng = np.random.default_rng(12)
    vals = rng.uniform(0, 1000, size=2_000)
    d = TDigest(1e7)
    d.update_batch(vals)
    d.compress()
    assert len(d.means) == len(vals)
    s = np.sort(vals)
    n = len(s)
    for q in (0.5, 0.9, 0.99):
        cum = np.arange(n) + 0.5
        target = q * n
        i = int(np.searchsorted(cum, target) - 1)
        frac = (target - cum[i]) / (cum[i + 1] - cum[i])
        expect = s[i] + frac * (s[i + 1] - s[i])
        assert d.quantile(q) == pytest.approx(expect, rel=0, abs=1e-9)
