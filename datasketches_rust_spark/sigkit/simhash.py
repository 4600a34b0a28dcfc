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
    if len(values) == 0 or n_docs == 0:
        return np.zeros(n_docs, dtype=np.int64)
    nonempty = counts > 0
    # Byte-histogram form: per-bit counts NEVER require unpacking the
    # values to a bit matrix. For each of the 8 byte positions, one
    # ``np.bincount`` over (doc_id << 8 | byte_value) keys yields each
    # doc's byte-value histogram (scatter target n_docs*256 ints —
    # cache-resident, the CLAUDE.md criterion for scatter ops), and the
    # (256, 8) bit-table matmul turns histograms into the 8 bit counts of
    # that byte position. 8 bincounts + 8 tiny matmuls replace the 64
    # full passes of the per-bit-position loop (measured ~2.8× faster on
    # a 480k-shingle batch; exact same integer math).
    le = np.ascontiguousarray(values, dtype="<u8").view(np.uint8).reshape(-1, 8)
    base = np.repeat(np.arange(n_docs, dtype=np.int64), counts) << 8
    seg = np.empty((n_docs, 64), dtype=np.int64)
    for p in range(8):
        bc = np.bincount(base + le[:, p], minlength=n_docs * 256)
        seg[:, 8 * p : 8 * p + 8] = bc.reshape(n_docs, 256) @ _BITTAB8
    hit = (2 * seg >= counts[:, None]) & nonempty[:, None]
    packed = np.packbits(hit, axis=1, bitorder="little")  # (n_docs, 8) LE
    return packed.view("<u8").reshape(n_docs).astype(np.uint64).view(np.int64)


# bit j of byte value v: the histogram→bit-count conversion matrix
_BITTAB8 = np.array(
    [[(v >> j) & 1 for j in range(8)] for v in range(256)], dtype=np.int64
)

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
