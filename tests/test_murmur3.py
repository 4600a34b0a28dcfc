"""MurmurHash3 x64 128 kernel tests (no Spark).

Pinned two independent ways: the reference library's own test vectors
(murmurhash.rs:208-249), and a from-scratch scalar implementation written
directly from the public algorithm, cross-checked against the vectorized
kernel on random ragged inputs covering every tail length.
"""

import numpy as np

from datasketches_rust_spark.sigkit.murmur3 import (
    murmur3_bucket_indexes,
    murmur3_bytes,
    murmur3_row_seeds,
    murmur3_str_list,
    murmur3_x64_128,
)

MASK = (1 << 64) - 1


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & MASK


def _fmix(k):
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & MASK
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & MASK
    return k ^ (k >> 33)


def scalar_murmur3(data: bytes, seed: int = 0):
    """Independent scalar MurmurHash3 x64 128 (pure python ints)."""
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h1 = h2 = seed & MASK
    n = len(data)
    nblocks = n // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[16 * i : 16 * i + 8], "little")
        k2 = int.from_bytes(data[16 * i + 8 : 16 * i + 16], "little")
        h1 ^= (_rotl((k1 * c1) & MASK, 31) * c2) & MASK
        h1 = (_rotl(h1, 27) + h2) & MASK
        h1 = (h1 * 5 + 0x52DCE729) & MASK
        h2 ^= (_rotl((k2 * c2) & MASK, 33) * c1) & MASK
        h2 = (_rotl(h2, 31) + h1) & MASK
        h2 = (h2 * 5 + 0x38495AB5) & MASK
    tail = data[16 * nblocks :]
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:], "little")
        h2 ^= (_rotl((k2 * c2) & MASK, 33) * c1) & MASK
    if tail:
        k1 = int.from_bytes(tail[:8], "little")
        h1 ^= (_rotl((k1 * c1) & MASK, 31) * c2) & MASK
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & MASK
    h2 = (h2 + h1) & MASK
    h1, h2 = _fmix(h1), _fmix(h2)
    h1 = (h1 + h2) & MASK
    h2 = (h2 + h1) & MASK
    return h1, h2


# reference test vectors, murmurhash.rs:208-249
VECTORS = [
    (b"The quick brown fox jumps over the lazy dog", 0xE34BBC7BBC071B6C, 0x7A433CA9C49A9347),
    (b"The quick brown fox jumps over the lazy eog", 0x362108102C62D1C9, 0x3285CD100292B305),
    (b"The quick brown fox jumps over the lazy dogdogdog", 0x9C8205300E612FC4, 0xCBC0AF6136AA3DF9),
    (b"The quick brown fox jumps over the lazy1", 0xE3301A827E5CDFE3, 0xBDBF05F8DA0F0392),
    (b"The quick brown fox jumps over t", 0xDF6AF91BB29BDACF, 0x91A341C58DF1F3A6),
    (
        b"The quick brown fox jumps over the lazy dog\xffdog\x00",
        0xE88ABDA785929C9E,
        0x96B98587CACC83D6,
    ),
]


def test_reference_vectors():
    for data, e1, e2 in VECTORS:
        h1, h2 = murmur3_x64_128(data, seed=0)
        assert (h1, h2) == (e1, e2), data
        s1, s2 = scalar_murmur3(data, 0)
        assert (s1, s2) == (e1, e2), data


def test_last_vector_bytes_exact():
    """The ones-byte/zeros-byte vector (murmurhash.rs:241-248) verbatim."""
    key = bytes(
        [0x54, 0x68, 0x65, 0x20, 0x71, 0x75, 0x69, 0x63, 0x6B, 0x20, 0x62, 0x72,
         0x6F, 0x77, 0x6E, 0x20, 0x66, 0x6F, 0x78, 0x20, 0x6A, 0x75, 0x6D, 0x70,
         0x73, 0x20, 0x6F, 0x76, 0x65, 0x72, 0x20, 0x74, 0x68, 0x65, 0x20, 0x6C,
         0x61, 0x7A, 0x79, 0x20, 0x64, 0x6F, 0x67, 0xFF, 0x64, 0x6F, 0x67, 0x00]
    )
    assert murmur3_x64_128(key, 0) == (0xE88ABDA785929C9E, 0x96B98587CACC83D6)


def test_vectorized_matches_scalar_all_tail_lengths():
    rng = np.random.default_rng(5)
    docs = [bytes(rng.integers(0, 256, size=ln, dtype=np.uint8)) for ln in range(0, 41)]
    docs += [bytes(rng.integers(0, 256, size=int(ln), dtype=np.uint8))
             for ln in rng.integers(0, 200, size=30)]
    for seed in (0, 42, 9001, (1 << 63) + 17):
        flat = np.frombuffer(b"".join(docs), dtype=np.uint8)
        offs = np.concatenate([[0], np.cumsum([len(d) for d in docs])]).astype(np.int64)
        h1, h2 = murmur3_bytes(flat, offs, seed)
        for i, d in enumerate(docs):
            assert (int(h1[i]), int(h2[i])) == scalar_murmur3(d, seed), (i, len(d), seed)


def test_str_list_wrapper():
    h1, h2 = murmur3_str_list(["", "a", "hello world"], seed=7)
    for i, s in enumerate(["", "a", "hello world"]):
        assert (int(h1[i]), int(h2[i])) == scalar_murmur3(s.encode(), 7)


def test_row_seeds_match_reference_derivation():
    """countmin/sketch.rs:513-523: seed_i = h1(murmur128(LE64(i), seed))."""
    seeds = murmur3_row_seeds(9001, 5)
    for i in range(5):
        expect, _ = scalar_murmur3(int(i).to_bytes(8, "little"), 9001)
        assert int(seeds[i]) == expect
    assert len(set(seeds.tolist())) == 5


def test_bucket_indexes_match_reference_algorithm():
    """countmin/sketch.rs:423-428: bucket = h1(murmur128(item, row_seed)) % w."""
    items = [b"apple", b"banana", b"", b"x" * 33]
    flat = np.frombuffer(b"".join(items), dtype=np.uint8)
    offs = np.concatenate([[0], np.cumsum([len(d) for d in items])]).astype(np.int64)
    row_seeds = murmur3_row_seeds(9001, 3)
    idx = murmur3_bucket_indexes(flat, offs, row_seeds, 128)
    assert idx.shape == (4, 3)
    for i, item in enumerate(items):
        for r in range(3):
            h1, _ = scalar_murmur3(item, int(row_seeds[r]))
            assert idx[i, r] == h1 % 128
    assert (idx >= 0).all() and (idx < 128).all()
