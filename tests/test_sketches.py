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


# ----------------------------------------------------- binomial bounds

def test_binomial_bounds_reference_contract():
    """Pin the reference's branch behavior (binomial_bounds.rs tests)."""
    from datasketches_rust_spark.sigkit.binomial_bounds import (
        lower_bound,
        upper_bound,
    )

    # check_compute_approx_bino_lb_ub: theta just below 1-1e-5 with
    # 2<=n<=120 -> lb = n, ub = n+1
    theta = (2.0 - 1e-5) / 2.0
    assert lower_bound(100, theta, 1) == 100.0
    assert upper_bound(100, theta, 1) == 101.0
    # exact mode
    assert lower_bound(50, 1.0, 2) == 50.0
    assert upper_bound(50, 1.0, 2) == 50.0
    # no data seen
    assert upper_bound(0, 0.5, 2, no_data_seen=True) == 0.0
    # invalid args raise (check_check_args)
    for bad in (0.0, 1.01, -0.1):
        with pytest.raises(ValueError):
            lower_bound(10, bad, 1)
        with pytest.raises(ValueError):
            upper_bound(10, bad, 1)


def test_binomial_bounds_bracket_and_monotone():
    """Statistical contract at n in {1, 10, 100, 1000}: the 2-sigma bounds
    bracket the true count >= 90% of trials, and lb <= est <= ub always."""
    from datasketches_rust_spark.sigkit.binomial_bounds import (
        lower_bound,
        upper_bound,
    )

    rng = np.random.default_rng(101)
    for n_samples in (1, 10, 100, 1000):
        hits = 0
        trials = 200
        for _ in range(trials):
            # choose true N so that E[retained] = n_samples at theta
            theta = min(1.0, n_samples / 5000)
            true_n = int(n_samples / theta)
            k = rng.binomial(true_n, theta)
            if k == 0:
                k = 1
            lb = lower_bound(k, theta, 2)
            ub = upper_bound(k, theta, 2)
            est = k / theta
            assert lb <= est + 1e-9 <= ub + 1e-9
            if lb <= true_n <= ub:
                hits += 1
        assert hits / trials >= 0.90, (n_samples, hits / trials)


def test_binomial_bounds_tail_walk_matches_reference_regime():
    """In the reference's exact regime (2<=n<=120, est<500) our log-space
    walk must agree with a direct linear-space transcription."""
    import math

    from datasketches_rust_spark.sigkit.binomial_bounds import (
        _special_n_prime_f,
        _special_n_star,
        _delta_of_num_stdevs,
    )

    def n_star_linear(k, p, delta):
        q = 1.0 - p
        cur = p ** k
        tot = cur
        m = k
        while tot <= delta:
            cur = cur * q * m / (m + 1 - k)
            tot += cur
            m += 1
        return m - 1

    for k in (2, 5, 17, 60, 120):
        for est in (150, 300, 480):
            p = k / est
            if p >= 1:
                continue
            for z in (1, 2, 3):
                d = _delta_of_num_stdevs(float(z))
                assert _special_n_star(k, p, d) == n_star_linear(k, p, d), (k, p, z)
    # extended regime (reference would bail to tables): still returns a
    # proper bound ordering
    lo = _special_n_star(10, 10 / 5000, _delta_of_num_stdevs(2.0))
    hi = _special_n_prime_f(10, 10 / 5000, _delta_of_num_stdevs(2.0))
    assert lo is not None and hi is not None and lo < 5000 < hi


def test_jaccard_bounds_triple():
    from datasketches_rust_spark.sigkit.kmv import jaccard_bounds, kmv_signatures
    from datasketches_rust_spark.sigkit.xxhash import xxh64_u64

    ids = np.arange(40_000, dtype=np.uint64)
    h = xxh64_u64(ids, seed=55) >> np.uint64(1)
    a_full = np.sort(h[:30_000])
    b_full = np.sort(h[10_000:40_000])  # true J = 20000/40000 = 0.5
    # estimation mode: k=2048 signatures
    va, oa, ta, _ = kmv_signatures(a_full, np.array([0, len(a_full)]), 2048)
    vb, ob, tb, _ = kmv_signatures(b_full, np.array([0, len(b_full)]), 2048)
    lb, est, ub = jaccard_bounds(va, int(ta[0]), vb, int(tb[0]))
    assert lb <= est <= ub
    assert lb <= 0.5 <= ub  # truth bracketed at 2 sigma (fixed seed)
    assert est == pytest.approx(0.5, abs=0.05)
    # exact mode collapses the triple
    lb2, est2, ub2 = jaccard_bounds(a_full[:100], (1 << 63) - 1, a_full[:100], (1 << 63) - 1)
    assert lb2 == est2 == ub2 == 1.0


def test_jaccard_reference_edge_cases():
    """JaccardSimilarityOperator::compute edge branches
    (jaccard_similarity.rs:240-258 + identical_sets :322-334): never-updated
    pairs and identical estimation-mode sets collapse exactly; updated
    zero-retained pairs do NOT take the identical shortcut."""
    from datasketches_rust_spark.sigkit.kmv import MAX_THETA63, jaccard_bounds

    e = np.empty(0, np.uint64)
    a = np.array([100, 200, 300], np.uint64)
    t = 1 << 50  # estimation-mode theta (entries of `a` are all below it)

    assert jaccard_bounds(e, MAX_THETA63, e, MAX_THETA63) == (1.0, 1.0, 1.0)
    # exactly one never-updated -> exact 0 (reference returns exact(0.0))
    assert jaccard_bounds(e, MAX_THETA63, a, MAX_THETA63) == (0.0, 0.0, 0.0)
    assert jaccard_bounds(a, t, e, MAX_THETA63) == (0.0, 0.0, 0.0)
    # identical sets + identical theta in ESTIMATION mode -> exact (1,1,1)
    assert jaccard_bounds(a, t, a, t) == (1.0, 1.0, 1.0)
    # updated-but-zero-retained pair: falls to the empty-union ratio_bounds
    # branch, never the identical shortcut (the reference guards it with
    # !union.entries.is_empty())
    assert jaccard_bounds(e, t, e, t) == (0.0, 0.5, 1.0)
    # estimation-empty vs non-empty: plain ratio bounds (est 0, ub < 1)
    lb, est, ub = jaccard_bounds(e, t, a, t)
    assert lb == 0.0 and est == 0.0 and 0.0 < ub < 1.0


def test_countmin_accuracy_builders():
    """countmin/sketch.rs:121-155: epsilon = e/num_buckets, buckets =
    ceil(e/epsilon), hashes = ceil(ln 1/(1-confidence)) capped at 127."""
    import math

    from datasketches_rust_spark.functions.sketches import (
        countmin_relative_error,
        countmin_suggest_num_buckets,
        countmin_suggest_num_hashes,
        countmin_with_accuracy,
    )

    assert countmin_suggest_num_buckets(0.2) == 14  # ceil(e / 0.2)
    assert countmin_suggest_num_hashes(0.95) == 3  # ceil(ln 20)
    assert countmin_suggest_num_hashes(1.0) == 127  # exact-confidence cap
    assert countmin_suggest_num_hashes(0.0) == 0
    assert countmin_with_accuracy(0.01, 0.99) == (5, 272)
    # relative_error() and suggest_num_buckets() are inverse maps
    for w in (64, 128, 1024, 2048, 65536):
        assert countmin_suggest_num_buckets(countmin_relative_error(w)) == w
    assert countmin_relative_error(2048) == pytest.approx(math.e / 2048)
    with pytest.raises(ValueError):
        countmin_suggest_num_buckets(-0.1)
    with pytest.raises(ValueError):
        countmin_suggest_num_hashes(1.5)
    # zero error saturates like the reference's (E/0.0).ceil() as u32
    assert countmin_suggest_num_buckets(0.0) == (1 << 32) - 1
    with pytest.raises(ValueError):
        countmin_relative_error(0)
