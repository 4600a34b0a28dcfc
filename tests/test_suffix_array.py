"""Suffix array / LCP / shared-span kernel tests (no Spark)."""

import numpy as np

from datasketches_rust_spark.sigkit.suffix_array import (
    lcp_adjacent,
    shared_spans,
    suffix_array_bytes,
)


def naive_sa(b: bytes) -> list[int]:
    return sorted(range(len(b)), key=lambda i: b[i:])


def naive_lcp(b: bytes, sa: list[int]) -> list[int]:
    out = []
    for x, y in zip(sa, sa[1:]):
        s, t = b[x:], b[y:]
        k = 0
        while k < min(len(s), len(t)) and s[k] == t[k]:
            k += 1
        out.append(k)
    return out


def test_suffix_array_matches_naive():
    rng = np.random.default_rng(7)
    for n in (1, 2, 17, 100, 257):
        b = bytes(rng.integers(97, 101, size=n, dtype=np.uint8))  # small alphabet
        sa, hist = suffix_array_bytes(np.frombuffer(b, dtype=np.uint8))
        assert sa.tolist() == naive_sa(b), f"n={n}"
        lcp = lcp_adjacent(sa, hist)
        assert lcp.tolist() == naive_lcp(b, sa.tolist()), f"n={n}"


def test_shared_spans_detects_planted_duplicate():
    span = b"the quick brown fox jumps over the lazy dog " * 4  # 180 bytes
    docs = [
        b"aaaa-unique-prefix-one " + span + b" tail-one",
        b"bbbb-very-different-prefix " + span + b" other-tail",
        b"cccc totally unrelated content without the span at all",
    ]
    spans = shared_spans(docs, min_len=100)
    pairs = {(int(a), int(b)) for a, b, _ in spans}
    assert (0, 1) in pairs
    assert all(p in {(0, 1)} for p in pairs)
    ln = int(spans[spans[:, 0] == 0][0, 2])
    assert ln >= len(span)


def test_shared_spans_no_cross_boundary():
    """Sentinels must prevent spans bridging two documents."""
    docs = [b"x" * 200, b"x" * 200]  # identical; span = 200, not 400
    spans = shared_spans(docs, min_len=50)
    assert len(spans) == 1
    assert int(spans[0, 2]) == 200


def test_shared_spans_empty_and_none():
    assert shared_spans([b"abc", b"def"], min_len=2).shape == (0, 3)
    assert shared_spans([], min_len=2).shape == (0, 3)


def test_buffer_path_matches_list_path():
    """concat_buf_with_sentinels / shared_spans_buf (the zero-copy Arrow
    entry) must be byte-identical to the list-of-bytes reference path."""
    from datasketches_rust_spark.sigkit.suffix_array import (
        concat_buf_with_sentinels,
        concat_with_sentinels,
        shared_spans_buf,
    )

    rng = np.random.default_rng(11)
    span = bytes(rng.integers(97, 123, size=150, dtype=np.uint8))
    docs = [
        bytes(rng.integers(97, 123, size=80, dtype=np.uint8)) + span,
        span + bytes(rng.integers(97, 123, size=60, dtype=np.uint8)),
        b"",
        bytes(rng.integers(97, 123, size=40, dtype=np.uint8)),
    ]
    flat = np.frombuffer(b"".join(docs), dtype=np.uint8)
    offs = np.concatenate([[0], np.cumsum([len(d) for d in docs])]).astype(np.int64)

    ref_buf, ref_offs = concat_with_sentinels(docs)
    got_buf, got_offs = concat_buf_with_sentinels(flat, offs)
    np.testing.assert_array_equal(got_buf, ref_buf)
    np.testing.assert_array_equal(got_offs, ref_offs)

    np.testing.assert_array_equal(
        shared_spans_buf(flat, offs, min_len=100), shared_spans(docs, min_len=100)
    )
    # empty batch
    assert shared_spans_buf(
        np.empty(0, np.uint8), np.zeros(1, np.int64), min_len=10
    ).shape == (0, 3)
