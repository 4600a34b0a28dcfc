"""Vectorized XXH64 in numpy.

Reimplements the XXH64 algorithm (constants and structure per the public
xxHash spec; the reference implementation lives at
``/root/reference/datasketches/src/hash/xxhash.rs:25-29`` (primes),
``:108-117`` (``hash_u64`` 8-byte fast path) and ``:151-197``
(finish/finalize)) as batch numpy kernels with no per-item Python.

Two entry points:

- :func:`xxh64_u64` — the 8-byte little-endian fast path, vectorized over a
  ``uint64`` array (mirrors ``XxHash64::hash_u64``). This is the in-kernel
  workhorse for re-hashing shingle hashes (band seeds, salting).
- :func:`xxh64_bytes` — arbitrary-length byte strings given as one
  concatenated ``uint8`` buffer plus offsets (exactly the Arrow string
  layout). Internally buckets rows by length so every bucket is processed as
  a dense ``(n, L)`` matrix with loops only over *length*, never over rows.

Spark's built-in ``F.xxhash64`` is the same XXH64 (seed 42); parity is
pinned in tests/test_xxhash.py against both the reference's official test
vectors (``xxhash.rs:239-267``) and Spark itself.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64

P1 = U64(0x9E3779B185EBCA87)
P2 = U64(0xC2B2AE3D27D4EB4F)
P3 = U64(0x165667B19E3779F9)
P4 = U64(0x85EBCA77C2B2AE63)
P5 = U64(0x27D4EB2F165667C5)

_0 = U64(0)
_64 = U64(64)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = U64(r)
    return (x << r) | (x >> (_64 - r))


def _round(acc, lane):
    acc = acc + lane * P2
    return _rotl(acc, 31) * P1


def _merge_round(acc, v):
    acc = acc ^ _round(_0, v)
    return acc * P1 + P4


def _finalize(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> U64(33))
    h = h * P2
    h = h ^ (h >> U64(29))
    h = h * P3
    return h ^ (h >> U64(32))


def xxh64_u64(x, seed: int = 0) -> np.ndarray:
    """XXH64 of each value's 8-byte little-endian encoding (vectorized).

    Matches ``XxHash64::hash_u64`` (xxhash.rs:108-117) and
    ``xxh64(long)`` semantics of Spark's ``F.xxhash64`` on LongType.
    """
    x = np.asarray(x, dtype=np.uint64)
    acc = U64((seed + int(P5) + 8) % (1 << 64))
    acc = acc ^ _round(_0, x)
    acc = _rotl(acc, 27) * P1 + P4
    return _finalize(acc)


def _xxh64_fixed(m: np.ndarray, seed: int) -> np.ndarray:
    """XXH64 of every row of a dense (n, L) uint8 matrix."""
    n, length = m.shape
    mod = 1 << 64
    seed = seed % mod
    if length >= 32:
        nstripes = length // 32
        lanes = np.ascontiguousarray(m[:, : nstripes * 32]).view("<u8")
        v1 = np.full(n, U64((seed + int(P1) + int(P2)) % mod), dtype=np.uint64)
        v2 = np.full(n, U64((seed + int(P2)) % mod), dtype=np.uint64)
        v3 = np.full(n, U64(seed), dtype=np.uint64)
        v4 = np.full(n, U64((seed - int(P1)) % mod), dtype=np.uint64)
        for s in range(nstripes):
            b = 4 * s
            v1 = _round(v1, lanes[:, b])
            v2 = _round(v2, lanes[:, b + 1])
            v3 = _round(v3, lanes[:, b + 2])
            v4 = _round(v4, lanes[:, b + 3])
        h = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
        pos = nstripes * 32
    else:
        h = np.full(n, U64((seed + int(P5)) % mod), dtype=np.uint64)
        pos = 0

    h = h + U64(length)

    while pos + 8 <= length:
        lane = np.ascontiguousarray(m[:, pos : pos + 8]).view("<u8")[:, 0]
        h = h ^ _round(_0, lane)
        h = _rotl(h, 27) * P1 + P4
        pos += 8
    if pos + 4 <= length:
        lane = np.ascontiguousarray(m[:, pos : pos + 4]).view("<u4")[:, 0].astype(np.uint64)
        h = h ^ (lane * P1)
        h = _rotl(h, 23) * P2 + P3
        pos += 4
    while pos < length:
        lane = m[:, pos].astype(np.uint64)
        h = h ^ (lane * P5)
        h = _rotl(h, 11) * P1
        pos += 1
    return _finalize(h)


def xxh64_slices(
    data: np.ndarray, starts: np.ndarray, lengths: np.ndarray, seed: int = 0
) -> np.ndarray:
    """XXH64 of ``n`` ragged byte slices ``data[starts[i]:starts[i]+lengths[i]]``.

    Rows are bucketed by length; each bucket runs as one dense matrix, so
    Python-level iteration is over distinct lengths only.
    """
    data = np.asarray(data, dtype=np.uint8)
    starts = np.asarray(starts, dtype=np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)
    n = len(lengths)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    # one argsort groups equal lengths contiguously — the per-unique-length
    # `lengths == L` formulation rescanned the whole array once per
    # distinct length (~40 full passes on a code-token batch). Stable int
    # argsort is a radix sort with one pass per key byte, so sorting the
    # (tiny) lengths as uint16 runs 2 passes instead of int64's 8 —
    # measured ~4× faster on a 490k-token batch; identical order.
    if lengths.size and int(lengths.max()) < (1 << 16):
        order = np.argsort(lengths.astype(np.uint16), kind="stable")
    else:
        order = np.argsort(lengths, kind="stable")
    sorted_lengths = lengths[order]
    bounds = np.nonzero(np.diff(sorted_lengths))[0] + 1
    for sel in np.split(order, bounds):
        length = int(lengths[sel[0]])
        if length == 0:
            out[sel] = _xxh64_fixed(np.empty((len(sel), 0), dtype=np.uint8), seed)
        else:
            # gather bucket rows through a zero-copy sliding-window VIEW:
            # one (n,) row-index fancy gather materializes the (n, L)
            # matrix directly, instead of building an (n, L) int64 index
            # matrix first — measured ~1.6× faster on a 490k-token batch
            sw = np.lib.stride_tricks.sliding_window_view(data, length)
            out[sel] = _xxh64_fixed(sw[starts[sel]], seed)
    return out


def xxh64_u64_matrix(m: np.ndarray, seed: int = 0) -> np.ndarray:
    """XXH64 of each row of an (n, w) uint64 matrix, hashed as 8w LE bytes.

    Used for shingle hashing (w consecutive token hashes) and band hashing
    (r consecutive bucket minhashes): one dense vectorized call per batch.
    """
    m = np.ascontiguousarray(m, dtype="<u8")
    n, w = m.shape
    return _xxh64_fixed(m.view(np.uint8).reshape(n, 8 * w), seed)


def xxh64_bytes(data: np.ndarray, offsets: np.ndarray, seed: int = 0) -> np.ndarray:
    """XXH64 of ``n`` ragged byte strings in Arrow layout.

    ``data`` is a flat uint8 buffer, ``offsets`` an (n+1,) int array; row i
    is ``data[offsets[i]:offsets[i+1]]``.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    return xxh64_slices(data, offsets[:-1], np.diff(offsets), seed)


def xxh64_str_list(strings, seed: int = 0) -> np.ndarray:
    """Convenience wrapper: XXH64 of each UTF-8 string in a Python list."""
    bufs = [s.encode("utf-8") for s in strings]
    offsets = np.zeros(len(bufs) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in bufs], out=offsets[1:])
    data = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    return xxh64_bytes(data, offsets, seed)
