"""64-bit SimHash + Hamming kernels over per-doc shingle-hash segments.

SimHash (Charikar 2002): each doc's fingerprint bit j is the majority vote
of bit j over its (distinct) shingle hashes. Computed from the same shingle
hash stream as the KMV signature — hashing is paid once, mirroring the
coupon fan-out idea in /root/reference/datasketches/src/hll/mod.rs:170-175.

Vectorization: the Python loop runs over the 64 bit positions, never over
rows or shingles; per-bit counts use ``np.add.reduceat`` over doc segments.
"""

from __future__ import annotations

import numpy as np


def simhash64(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """(n_docs,) int64 SimHash per doc segment; empty segment → 0.

    Bit j is set iff 2 * popcount_j >= n (ties round up — deterministic).
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    n_docs = len(offsets) - 1
    counts = np.diff(offsets)
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(values) == 0 or n_docs == 0:
        return out.view(np.int64)
    nonempty = counts > 0
    # A zero sentinel keeps every offset a valid reduceat index (a trailing
    # empty segment's start == len(values)) WITHOUT clipping — clipping the
    # next segment's start truncates the previous segment's sum. The
    # sentinel contributes 0 to every bit count, so segment sums that run
    # to the end of the array are unchanged; empty segments are masked.
    ext = np.concatenate([values.astype(np.uint64, copy=False),
                          np.zeros(1, dtype=np.uint64)])
    starts = offsets[:-1]
    for j in range(64):
        bit = (ext >> np.uint64(j)) & np.uint64(1)
        seg = np.add.reduceat(bit, starts)
        hit = (2 * seg >= counts) & nonempty
        out |= hit.astype(np.uint64) << np.uint64(j)
    return out.view(np.int64)


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between two int64/uint64 arrays."""
    x = (np.asarray(a).astype(np.int64).view(np.uint64)
         ^ np.asarray(b).astype(np.int64).view(np.uint64))
    d = np.zeros(len(x), dtype=np.int64)
    for _ in range(8):
        d += _POP8[(x & np.uint64(0xFF)).astype(np.uint8)]
        x = x >> np.uint64(8)
    return d
