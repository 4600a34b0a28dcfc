"""Suffix array + LCP kernels (vectorized prefix doubling).

The substring-dedup stage's positional index: a suffix array over the
concatenated text of a batch of documents, with LCPs between adjacent
suffixes computed from the doubling rank history (O(log n) vectorized
passes — no per-suffix Python, unlike Kasai's sequential scan).

Used by operators.substring.duplicated_spans to find verbatim text spans
shared across documents (partial duplication — a strictly stronger signal
than whole-doc containment). Documents are separated by \\x00 + a 4-byte
position counter so no comparison can run across a boundary.
"""

from __future__ import annotations

import numpy as np


def suffix_array_bytes(data: np.ndarray) -> tuple[np.ndarray, list[np.ndarray]]:
    """(suffix array, rank history per doubling level) of a uint8 buffer.

    Prefix doubling with numpy lexsort: O(n log n) total, loops only over
    the ~log2(n) doubling levels.
    """
    data = np.asarray(data, dtype=np.uint8)
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.int64), []
    rank = data.astype(np.int64)
    ranks_history = [rank]
    k = 1
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        if k < n:
            key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        pair_prev = np.empty(n, dtype=bool)
        pair_prev[0] = True
        pair_prev[1:] = (rank[order[1:]] != rank[order[:-1]]) | (
            key2[order[1:]] != key2[order[:-1]]
        )
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.cumsum(pair_prev) - 1
        rank = new_rank
        ranks_history.append(rank)
        if rank[order[-1]] == n - 1:
            return order, ranks_history
        k *= 2


def lcp_adjacent(
    sa: np.ndarray, ranks_history: list[np.ndarray], cap: int | None = None
) -> np.ndarray:
    """LCP between each adjacent suffix pair (sa[i], sa[i+1]).

    Binary lifting over the doubling rank history: at level l (block 2^l),
    equal ranks mean the next 2^l chars agree — add and advance. Vectorized
    across all n-1 pairs; ~log2(n) passes.
    """
    n = len(sa)
    if n < 2:
        return np.empty(0, dtype=np.int64)
    total_n = len(ranks_history[0])
    i = sa[:-1].copy()
    j = sa[1:].copy()
    lcp = np.zeros(n - 1, dtype=np.int64)
    levels = range(len(ranks_history) - 1, -1, -1)
    for l in levels:
        step = 1 << l
        if cap is not None and step > 2 * cap:
            continue
        rank = ranks_history[l]
        ok = (
            (i + step <= total_n)
            & (j + step <= total_n)
            & (i < total_n)
            & (j < total_n)
        )
        ii = np.where(ok, i, 0)
        jj = np.where(ok, j, 0)
        eq = ok & (rank[ii] == rank[jj])
        lcp += np.where(eq, step, 0)
        i = i + np.where(eq, step, 0)
        j = j + np.where(eq, step, 0)
    return lcp


def concat_with_sentinels(texts: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate docs with \\x00 + LE32 counter separators.

    Returns (buffer uint8, (n+1,) doc start offsets). The unique counter
    bytes guarantee no suffix comparison crosses a document boundary.
    """
    parts = []
    offsets = [0]
    pos = 0
    for idx, t in enumerate(texts):
        parts.append(t)
        parts.append(b"\x00" + int(idx).to_bytes(4, "little"))
        pos += len(t) + 5
        offsets.append(pos)
    buf = np.frombuffer(b"".join(parts), dtype=np.uint8)
    return buf, np.asarray(offsets, dtype=np.int64)


def concat_buf_with_sentinels(
    buf: np.ndarray, offs: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """``concat_with_sentinels`` for an already-flat (uint8 buffer,
    (n+1,) offsets) batch — e.g. an Arrow string column's data buffer —
    inserting the \\x00 + LE32 separators with vectorized scatters, no
    per-doc Python bytes objects (round-4 VERDICT finding #2)."""
    buf = np.asarray(buf, dtype=np.uint8)
    offs = np.asarray(offs, dtype=np.int64)
    n = len(offs) - 1
    d = np.arange(n, dtype=np.int64)
    out = np.empty(len(buf) + 5 * n, dtype=np.uint8)
    lens = np.diff(offs)
    # doc d's bytes shift right by the 5*d separator bytes before them
    out[np.arange(len(buf), dtype=np.int64) + 5 * np.repeat(d, lens)] = buf
    sent = offs[1:] + 5 * d  # separator start of doc d
    out[sent] = 0
    out[sent[:, None] + np.arange(1, 5, dtype=np.int64)] = (
        d.astype("<u4").view(np.uint8).reshape(n, 4)
    )
    new_offs = np.zeros(n + 1, dtype=np.int64)
    new_offs[1:] = offs[1:] + 5 * (d + 1)
    return out, new_offs


def shared_spans(texts: list[bytes], min_len: int) -> np.ndarray:
    """Cross-document duplicated spans of >= min_len bytes.

    Returns an (m, 3) int64 array of (doc_a, doc_b, span_len) for adjacent
    suffix pairs from *different* documents with LCP >= min_len (doc_a <
    doc_b; the longest span per pair, deduplicated).
    """
    return _spans_core(*concat_with_sentinels(texts), min_len)


def shared_spans_buf(buf: np.ndarray, offs: np.ndarray, min_len: int) -> np.ndarray:
    """``shared_spans`` over a flat (uint8 buffer, offsets) batch — the
    zero-copy Arrow entry point used by operators.substring."""
    return _spans_core(*concat_buf_with_sentinels(buf, offs), min_len)


def _spans_core(buf: np.ndarray, offsets: np.ndarray, min_len: int) -> np.ndarray:
    sa, hist = suffix_array_bytes(buf)
    lcp = lcp_adjacent(sa, hist, cap=1 << 20)
    doc_of = np.searchsorted(offsets, sa, side="right") - 1
    # clip spans at the true text end (the matching \x00 of two sentinels
    # would otherwise add one byte)
    text_left = offsets[doc_of + 1] - 5 - sa
    lcp = np.minimum(lcp, np.minimum(text_left[:-1], text_left[1:]))
    da, db = doc_of[:-1], doc_of[1:]
    hit = (lcp >= min_len) & (da != db)
    if not hit.any():
        return np.empty((0, 3), dtype=np.int64)
    a = np.minimum(da[hit], db[hit])
    b = np.maximum(da[hit], db[hit])
    spans = np.stack([a, b, lcp[hit]], axis=1)
    # keep max span per (a, b)
    order = np.lexsort((-spans[:, 2], spans[:, 1], spans[:, 0]))
    spans = spans[order]
    first = np.empty(len(spans), dtype=bool)
    first[0] = True
    first[1:] = (spans[1:, 0] != spans[:-1, 0]) | (spans[1:, 1] != spans[:-1, 1])
    return spans[first]
