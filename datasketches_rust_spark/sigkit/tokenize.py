"""Vectorized tokenizer + shingle hasher.

Turns a batch of documents into per-document sets of 63-bit shingle hashes
with **no per-row Python**: all docs in a batch are concatenated into one
byte buffer; token boundaries, token hashes, w-gram shingle hashes and
per-doc distinct sets are computed with numpy array ops whose Python-level
loops run over *byte-length buckets* or *bit positions*, never over rows.

Semantics mirror the reference's update path
(`/root/reference/datasketches/src/thetafamily/theta/sketch.rs:128-130` →
`common/hash_table.rs:135-140`): every item (here: a token w-gram) is hashed
with a seeded 64-bit hash and kept as ``hash >> 1`` (63-bit, Java-compatible
sign-safe form); hash value 0 is screened out (``hash_table.rs:160-163``).

Tokenizer v1: maximal runs of ``[A-Za-z0-9_]`` bytes (ASCII identifier
runs; multi-byte UTF-8 codepoints act as separators, which agrees with the
regex ``[A-Za-z0-9_]+`` on codepoints).
"""

from __future__ import annotations

import numpy as np

from .xxhash import xxh64_slices, xxh64_u64

# byte classes for tokenizer v1
_TOKEN_BYTE = np.zeros(256, dtype=bool)
for _lo, _hi in ((48, 58), (65, 91), (97, 123)):  # 0-9 A-Z a-z
    _TOKEN_BYTE[_lo:_hi] = True
_TOKEN_BYTE[95] = True  # _
_TOKEN_BYTE_I8 = _TOKEN_BYTE.astype(np.int8)  # 0/1 form for the diff pass


def concat_docs(texts) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate docs into a flat buffer (the Arrow string layout).

    Returns (flat uint8 buffer, (n+1,) int64 doc offsets into it).
    """
    bufs = [t.encode("utf-8") for t in texts]
    offsets = np.zeros(len(bufs) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in bufs], out=offsets[1:])
    data = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    return data, offsets


def token_spans(
    buf: np.ndarray, doc_offsets: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """(starts, lengths) of maximal token-byte runs in a flat buffer.

    When ``doc_offsets`` is given (documents packed back-to-back, Arrow
    layout), runs straddling a document boundary are split at it — the
    Python loop runs over *boundary-crossing spans* only (≤ n_docs per
    batch), never over tokens.
    """
    if len(buf) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    # run boundaries from ONE signed diff of the 0/1 class array: +1 marks a
    # run start, -1 the (exclusive) end — one temp instead of the three
    # 1-byte-per-input-byte masks the shift formulation needs.
    # The class array comes from SIMD range compares (case-folded a-z,
    # digits, underscore), measured ~1.6× faster than the 256-entry table
    # gather; the bool result is viewed as int8 zero-copy for the diff.
    folded = buf | np.uint8(0x20)
    mask = (
        ((folded >= 97) & (folded <= 122)) | ((buf >= 48) & (buf <= 57)) | (buf == 95)
    ).view(np.int8)
    d = np.empty(len(mask) + 1, dtype=np.int8)
    d[0] = mask[0]
    np.subtract(mask[1:], mask[:-1], out=d[1:-1])
    d[-1] = -mask[-1]
    # two bool-compare nonzero passes: measured FASTER than the fused
    # one-nonzero + sign-gather form (bool nonzero is SIMD; the 1M-element
    # fancy gather is not)
    starts = np.nonzero(d == 1)[0]
    ends = np.nonzero(d == -1)[0]

    if doc_offsets is not None and len(starts):
        inner = doc_offsets[1:-1]
        # a span (s, e) crossing boundary b (s < b < e) splits into (s,b),(b,e)
        span_of_b = np.searchsorted(starts, inner, side="right") - 1
        crossing = (span_of_b >= 0) & (inner > starts[np.maximum(span_of_b, 0)]) & (
            inner < ends[np.maximum(span_of_b, 0)]
        )
        if crossing.any():
            # dedupe (span, cut) — empty docs repeat the same boundary;
            # np.unique leaves pairs sorted by (span, ascending cut)
            pairs = np.unique(
                np.stack([span_of_b[crossing], inner[crossing]], axis=1), axis=0
            )
            spv, cutv = pairs[:, 0], pairs[:, 1]
            # piece for cut j runs to the next cut in the same span, else to
            # the span's old end; the owning span is truncated at its FIRST
            # cut — all vectorized, then one in-order np.insert pass (the
            # previous per-cut loop + full argsort cost ~0.5 s per 40 MB
            # batch for a handful of crossings)
            piece_ends = np.empty(len(spv), dtype=np.int64)
            if len(spv) > 1:
                piece_ends[:-1] = np.where(spv[:-1] == spv[1:], cutv[1:], ends[spv[:-1]])
            piece_ends[-1] = ends[spv[-1]]
            first = np.ones(len(spv), dtype=bool)
            first[1:] = spv[1:] != spv[:-1]
            ends = ends.copy()
            ends[spv[first]] = cutv[first]
            starts = np.insert(starts, spv + 1, cutv)
            ends = np.insert(ends, spv + 1, piece_ends)

    return starts, ends - starts


def token_hash_stream_buf(
    buf: np.ndarray, doc_offsets: np.ndarray, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Token hashes for docs packed in one buffer (zero-copy Arrow path).

    Returns (token_hashes uint64, (n_docs+1,) int64 token offsets): doc i's
    tokens are ``hashes[tok_off[i]:tok_off[i+1]]`` in document order.
    """
    n_docs = len(doc_offsets) - 1
    starts, lengths = token_spans(buf, doc_offsets)
    hashes = xxh64_slices(buf, starts, lengths, seed)
    # spans never straddle a doc boundary, so doc i's first token is the
    # first start >= doc_offsets[i] — O(n_docs log n_tokens), not a
    # per-token searchsorted
    tok_off = np.searchsorted(starts, doc_offsets).astype(np.int64)
    return hashes, tok_off


def token_hash_stream(texts, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """List-of-strings wrapper around :func:`token_hash_stream_buf`."""
    buf, doc_offsets = concat_docs(texts)
    return token_hash_stream_buf(buf, doc_offsets, seed)


def shingle_hashes_buf(
    buf: np.ndarray, doc_offsets: np.ndarray, width: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Distinct, sorted 63-bit w-gram shingle hashes per document.

    Zero-copy core: ``buf``/``doc_offsets`` is the Arrow string-column
    layout. Returns (values uint64 in [1, 2^63), (n_docs+1,) int64 offsets).
    A doc with 0 < n_tokens < width contributes one shingle over its whole
    token sequence; a doc with no tokens contributes none.
    """
    n_docs = len(doc_offsets) - 1
    tok_hashes, tok_off = token_hash_stream_buf(buf, doc_offsets, seed)
    n_tok_per_doc = np.diff(tok_off)

    shingle_vals = []
    shingle_docs = []

    # w-gram shingle hash: polynomial fold of the w token hashes finished
    # with the XXH64 8-byte avalanche (hash_u64 fast path, xxhash.rs:108-117)
    # — contiguous-slice passes only, no sliding-window gather.
    _B = np.uint64(0x9E3779B185EBCA87)  # odd → bijective per step

    def _poly_fold(start: np.ndarray, w: int, n_win: int) -> np.ndarray:
        acc = start[:n_win].copy()
        for j in range(1, w):
            acc = acc * _B + start[j : j + n_win]
        return xxh64_u64(acc, seed)

    # full-width shingles: sliding windows that do not cross doc boundaries
    if len(tok_hashes) >= width:
        n_win = len(tok_hashes) - width + 1
        vals_full = _poly_fold(tok_hashes, width, n_win)
        # token i belongs to doc repeat(arange, n_tok)[i]; the window at i
        # stays in-doc iff i+width <= that doc's token end — both built
        # with np.repeat over doc counts, no per-window searchsorted
        tok_doc = np.repeat(np.arange(n_docs, dtype=np.int64), n_tok_per_doc)
        doc_end = np.repeat(tok_off[1:], n_tok_per_doc)
        starts_doc = tok_doc[:n_win]
        in_doc = np.arange(n_win) + width <= doc_end[:n_win]
        if in_doc.any():
            rows = np.nonzero(in_doc)[0]
            shingle_vals.append(vals_full[rows])
            shingle_docs.append(starts_doc[rows])

    # short docs: one shingle over the full token-hash sequence
    short = np.nonzero((n_tok_per_doc > 0) & (n_tok_per_doc < width))[0]
    if len(short):
        for w in np.unique(n_tok_per_doc[short]):
            sel = short[n_tok_per_doc[short] == w]
            gathered = tok_hashes[tok_off[sel][:, None] + np.arange(int(w))]
            acc = gathered[:, 0].copy()
            for j in range(1, int(w)):
                acc = acc * _B + gathered[:, j]
            shingle_vals.append(xxh64_u64(acc, seed))
            shingle_docs.append(sel)

    if shingle_vals:
        vals = np.concatenate(shingle_vals) >> np.uint64(1)  # 63-bit form
        docs = np.concatenate(shingle_docs)
        keep = vals != 0  # theta zero-hash screening (hash_table.rs:160-163)
        vals, docs = vals[keep], docs[keep]
    else:
        vals = np.empty(0, dtype=np.uint64)
        docs = np.empty(0, dtype=np.int64)

    # distinct + sort per doc. ``docs`` is non-decreasing except for the
    # appended short-doc shingles, so a counting pass groups rows per doc
    # and each doc's values are sorted IN PLACE — per-doc slices are
    # L1-resident, unlike a global lexsort whose gathers are DRAM-bound
    # and stop scaling across 16 workers (BASELINE.md calibration).
    counts = np.bincount(docs, minlength=n_docs)
    raw_off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=raw_off[1:])
    if len(shingle_docs) > 1 or (len(docs) and not _is_nondecreasing(docs)):
        order = np.argsort(docs, kind="stable")
        vals = vals[order]
    keep_parts = []
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    kept = 0
    for d in range(n_docs):
        lo, hi = raw_off[d], raw_off[d + 1]
        if hi > lo:
            seg = np.unique(vals[lo:hi])  # sorts + dedups the slice
            keep_parts.append(seg)
            kept += len(seg)
        offsets[d + 1] = kept
    vals = np.concatenate(keep_parts) if keep_parts else np.empty(0, np.uint64)
    return vals, offsets


def _is_nondecreasing(a: np.ndarray) -> bool:
    return bool(np.all(a[1:] >= a[:-1])) if len(a) > 1 else True


def shingle_hashes(texts, width: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """List-of-strings wrapper around :func:`shingle_hashes_buf`."""
    buf, doc_offsets = concat_docs(texts)
    return shingle_hashes_buf(buf, doc_offsets, width, seed)
