"""Pin the numpy XXH64 kernel against the reference's official vectors.

Vectors from /root/reference/datasketches/src/hash/xxhash.rs:222-267
(fill_test_buffer + test_vectors_seed_zero/prime32 + hash_u64 long check).
Spark F.xxhash64 parity is covered in tests/test_spark_parity.py.
"""

import numpy as np

from datasketches_rust_spark.sigkit.xxhash import xxh64_bytes, xxh64_str_list, xxh64_u64

PRIME32 = 0x9E3779B1
PRIME64 = 0x9E3779B185EBCA8D


def fill_test_buffer(n: int) -> bytes:
    out = bytearray(n)
    gen = PRIME32
    for i in range(n):
        out[i] = (gen >> 56) & 0xFF
        gen = (gen * PRIME64) % (1 << 64)
    return bytes(out)


def _hash_one(buf: bytes, seed: int) -> int:
    data = np.frombuffer(buf, dtype=np.uint8)
    offsets = np.array([0, len(buf)], dtype=np.int64)
    return int(xxh64_bytes(data, offsets, seed)[0])


def test_vectors_seed_zero():
    buf = fill_test_buffer(101)
    assert _hash_one(buf[:0], 0) == 0xEF46DB3751D8E999
    assert _hash_one(buf[:1], 0) == 0xE934A84ADB052768
    assert _hash_one(buf[:32], 0) == 0x18B216492BB44B70
    assert _hash_one(buf[:33], 0) == 0x55C8DC3E578F5B59
    assert _hash_one(buf[:100], 0) == 0x4BFE019CD91D9EA4


def test_vectors_seed_prime32():
    buf = fill_test_buffer(101)
    assert _hash_one(buf[:0], PRIME32) == 0xAC75FDA2929B17EF
    assert _hash_one(buf[:1], PRIME32) == 0x5014607643A9B4C3
    assert _hash_one(buf[:32], PRIME32) == 0xB3F33BDF93ADE409
    assert _hash_one(buf[:100], PRIME32) == 0x4853706DC9625CAE


def test_all_lengths_against_batched():
    """Ragged batch of every length 0..96 equals per-string hashing."""
    buf = fill_test_buffer(96)
    strs = [buf[:i] for i in range(97)]
    offsets = np.zeros(98, dtype=np.int64)
    np.cumsum([len(s) for s in strs], out=offsets[1:])
    data = np.frombuffer(b"".join(strs), dtype=np.uint8)
    batched = xxh64_bytes(data, offsets, seed=7)
    singles = np.array([_hash_one(s, 7) for s in strs], dtype=np.uint64)
    assert np.array_equal(batched, singles)


def test_hash_u64_matches_8byte_path():
    """XxHash64::hash_u64(x, seed) == write(x.to_le_bytes()) (xxhash.rs:258-266)."""
    rng = np.random.default_rng(9001)
    xs = rng.integers(0, 1 << 63, size=257, dtype=np.uint64)
    for seed in (0, 42, PRIME32):
        fast = xxh64_u64(xs, seed)
        slow = np.array(
            [_hash_one(int(x).to_bytes(8, "little"), seed) for x in xs], dtype=np.uint64
        )
        assert np.array_equal(fast, slow)


def test_str_list_wrapper():
    vals = ["", "a", "hello world", "x" * 100]
    h = xxh64_str_list(vals, seed=42)
    assert len(h) == 4
    assert len(set(h.tolist())) == 4
