"""Count-Min, Bloom, frequent-items and HLL as Spark-native aggregates.

Each sketch is re-expressed in Spark's partial→final aggregation model
with JVM-only expressions (the sketch state becomes a small DataFrame or a
group of rows), mirroring the reference's merge contracts:

- Count-Min (countmin/sketch.rs:47-98, merge :254-267): the d×w counter
  matrix IS a grouped count table keyed by (row, bucket); elementwise `+`
  merge is what groupBy().sum() does. Bucket index = hash(item, row) % w
  (per-row derived seeds, countmin/sketch.rs:423-428).
- Bloom (bloom/sketch.rs:123-126, :510-554): Kirsch-Mitzenmacher double
  hashing h0 + i*h1; the bit set is a distinct-positions DataFrame, union
  is just distinct-union of positions (bit-OR, bloom/sketch.rs:179-197);
  probes are a broadcast join counting matched positions == k.
- Frequent items (frequencies/sketch.rs:96-132): in exact mode (map size
  >= distinct items) Misra-Gries never purges, so counts are exact
  groupBy counts and the threshold query is `HAVING cnt >= threshold`
  with NoFalseNegatives/NoFalsePositives coinciding.
- HLL (hll/sketch.rs:91-104): Spark's approx_count_distinct IS an HLL++
  union; ``hll_distinct`` just fixes the rsd parameter mapping.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame, functions as F

# ----------------------------------------------------------------- count-min

_CM_MAX_HASHES = 127


_CM_MAX_BUCKETS = (1 << 32) - 1  # u32::MAX — the reference's saturating cast


def countmin_suggest_num_buckets(relative_error: float) -> int:
    """Buckets needed for a target relative error: ceil(e / epsilon)
    (countmin/sketch.rs:135-139; epsilon = e/num_buckets per :121-123).
    relative_error == 0 saturates to u32::MAX exactly as the reference's
    `(E / 0.0).ceil() as u32` does."""
    import math

    if relative_error < 0.0:
        raise ValueError("relative_error must be at least 0")
    if relative_error == 0.0:
        return _CM_MAX_BUCKETS
    return int(min(math.ceil(math.e / relative_error), _CM_MAX_BUCKETS))


def countmin_suggest_num_hashes(confidence: float) -> int:
    """Hash rows needed for a target confidence 1-delta:
    ceil(ln(1/(1-confidence))), capped at 127 (countmin/sketch.rs:145-155)."""
    import math

    if not 0.0 <= confidence <= 1.0:
        raise ValueError("confidence must be between 0 and 1.0 (inclusive)")
    if confidence == 1.0:
        return _CM_MAX_HASHES
    return int(min(math.ceil(math.log(1.0 / (1.0 - confidence))), _CM_MAX_HASHES))


def countmin_relative_error(width: int) -> float:
    """epsilon implied by a bucket count (countmin/sketch.rs:121-123)."""
    import math

    if width <= 0:
        raise ValueError("width must be greater than 0")
    return math.e / width


def countmin_with_accuracy(relative_error: float, confidence: float) -> tuple[int, int]:
    """(num_hashes, width) for target error bounds — the accuracy-first
    builder pairing ``bloom_with_accuracy``, so callers stop hand-picking
    ``num_hashes=3, width=2048`` and hoping."""
    return countmin_suggest_num_hashes(confidence), countmin_suggest_num_buckets(relative_error)


def _cm_bucket(item: Column, row: int, width: int) -> Column:
    return F.pmod(F.xxhash64(item, F.lit(row)), F.lit(width)).cast("int")


def countmin_build(
    df: DataFrame,
    item_col: str,
    weight_col: str | None = None,
    num_hashes: int = 3,
    width: int = 2048,
) -> DataFrame:
    """Build the CM counter table: (row int, bucket int, cnt long)."""
    item = F.col(item_col)
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    idx = F.array([_cm_bucket(item, r, width) for r in range(num_hashes)])
    ex = df.select(F.posexplode(idx).alias("row", "bucket"), w.alias("__w"))
    return ex.groupBy("row", "bucket").agg(F.sum("__w").alias("cnt"))


def countmin_merge(*sketches: DataFrame) -> DataFrame:
    """Merge N Count-Min counter tables built with the SAME (num_hashes,
    width) config — elementwise counter addition (countmin/sketch.rs:
    254-267) is exactly a grouped sum over the (row, bucket) key. The
    config-compatibility contract is the caller's (the reference's merge
    errors on mismatched dimensions; a DataFrame carries no config, so
    pair this with one shared config constant per sketch family)."""
    from functools import reduce

    merged = reduce(lambda a, b: a.unionByName(b), sketches)
    return merged.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def countmin_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    num_hashes: int = 3,
    width: int = 2048,
) -> DataFrame:
    """Point queries: est = min over rows of the bucket counters."""
    item = F.col(item_col)
    idx = F.array([_cm_bucket(item, r, width) for r in range(num_hashes)])
    ex = items.select(item, F.posexplode(idx).alias("row", "bucket"))
    return (
        ex.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .fillna({"cnt": 0})
        .groupBy(item_col)
        .agg(F.min("cnt").alias("est_count"))
    )


# ----------------------------------------------------------------- bloom

_BLOOM_MIN_BITS, _BLOOM_MAX_BITS = 64, 1 << 40
_BLOOM_MIN_HASHES, _BLOOM_MAX_HASHES = 1, 1024


def bloom_suggest_num_bits(max_items: int, fpp: float) -> int:
    """Optimal m = ceil(-n ln(fpp) / ln(2)^2) (bloom/builder.rs:187-195)."""
    import math

    if max_items <= 0:
        raise ValueError("max_items must be greater than 0")
    if not 0.0 < fpp <= 1.0:
        raise ValueError("fpp must be in (0.0, 1.0]")
    bits = math.ceil(-max_items * math.log(fpp) / (math.log(2) ** 2))
    return int(min(max(bits, _BLOOM_MIN_BITS), _BLOOM_MAX_BITS))


def bloom_suggest_num_hashes(max_items: int, num_bits: int) -> int:
    """Optimal k = ceil((m/n) ln 2) (bloom/builder.rs:210-220)."""
    import math

    k = math.ceil(num_bits / max_items * math.log(2))
    return int(min(max(k, _BLOOM_MIN_HASHES), _BLOOM_MAX_HASHES))


def bloom_with_accuracy(max_items: int, fpp: float) -> tuple[int, int]:
    """(num_bits, num_hashes) for a target capacity and false-positive
    rate — the ``with_accuracy`` builder (bloom/builder.rs:72-87), so
    callers stop hand-picking ``1 << 22`` and hoping."""
    m = bloom_suggest_num_bits(max_items, fpp)
    return m, bloom_suggest_num_hashes(max_items, m)


def _bloom_positions(col: Column, num_bits: int, num_hashes: int) -> Column:
    """Kirsch-Mitzenmacher double-hash positions (bloom/sketch.rs:510-554)."""
    # modular form of h0 + i*h1 (mod m): ANSI-safe (no 64-bit overflow,
    # i * (h1 mod m) <= k * m << 2^63)
    h0 = F.pmod(F.xxhash64(col), F.lit(num_bits))
    h1 = F.pmod(F.xxhash64(F.xxhash64(col)), F.lit(num_bits))
    return F.array(
        [
            F.pmod(h0 + F.lit(i) * h1, F.lit(num_bits)).cast("long")
            for i in range(num_hashes)
        ]
    )


def bloom_build(
    df: DataFrame, col: str, num_bits: int = 1 << 22, num_hashes: int = 5
) -> DataFrame:
    """Bit set as a distinct-position DataFrame (union = distinct union)."""
    return (
        df.select(F.explode(_bloom_positions(F.col(col), num_bits, num_hashes)).alias("bit"))
        .distinct()
    )


class BloomFilterDF(NamedTuple):
    """A bloom filter whose bit array is a distinct-positions DataFrame,
    carrying its (num_bits, num_hashes) config so complement/intersect are
    well-defined — the is_compatible contract of bloom/sketch.rs:179-186.
    The set-bit representation makes union/intersect sparse joins instead
    of dense bit-array scans; invert materializes against the explicit
    ``range(num_bits)`` universe."""

    bits: DataFrame
    num_bits: int
    num_hashes: int


def bloom_filter(
    df: DataFrame, col: str, num_bits: int = 1 << 22, num_hashes: int = 5
) -> BloomFilterDF:
    """Build a config-carrying bloom filter from a column."""
    return BloomFilterDF(bloom_build(df, col, num_bits, num_hashes), num_bits, num_hashes)


def _bloom_check_compatible(a: BloomFilterDF, b: BloomFilterDF) -> None:
    """Same size + hash count, as bloom/sketch.rs is_compatible requires."""
    if (a.num_bits, a.num_hashes) != (b.num_bits, b.num_hashes):
        raise ValueError(
            f"incompatible bloom filters: {(a.num_bits, a.num_hashes)} "
            f"vs {(b.num_bits, b.num_hashes)}"
        )


def bloom_union(a: BloomFilterDF, b: BloomFilterDF) -> BloomFilterDF:
    """Bitwise OR (bloom/sketch.rs:179-192) = distinct union of positions."""
    _bloom_check_compatible(a, b)
    return a._replace(bits=a.bits.unionByName(b.bits).distinct())


def bloom_intersect(a: BloomFilterDF, b: BloomFilterDF) -> BloomFilterDF:
    """Bitwise AND (bloom/sketch.rs:224-237) = inner join of position sets."""
    _bloom_check_compatible(a, b)
    return a._replace(bits=a.bits.join(b.bits, "bit", "left_semi"))


def bloom_invert(a: BloomFilterDF) -> BloomFilterDF:
    """Bitwise NOT (bloom/sketch.rs:255-260): anti-join of the explicit
    bit universe against the set positions. The universe is a ``range``
    scan — no materialized table, and the anti-join broadcasts the set
    side when small."""
    spark = a.bits.sparkSession
    universe = spark.range(a.num_bits).select(F.col("id").alias("bit"))
    return a._replace(bits=universe.join(a.bits, "bit", "left_anti"))


def bloom_contains(
    probe: DataFrame, col: str, f: BloomFilterDF
) -> DataFrame:
    """probe + ``might_contain`` against a config-carrying filter."""
    return bloom_might_contain(probe, col, f.bits, f.num_bits, f.num_hashes)


def bloom_bits_used(f: BloomFilterDF) -> int:
    """Number of set bits (bloom/sketch.rs bits_used; is_empty == 0)."""
    return f.bits.count()


def bloom_might_contain(
    probe: DataFrame,
    col: str,
    bits: DataFrame,
    num_bits: int = 1 << 22,
    num_hashes: int = 5,
) -> DataFrame:
    """probe + boolean ``might_contain``: all k positions set."""
    pos = _bloom_positions(F.col(col), num_bits, num_hashes)
    ex = probe.select("*", F.posexplode(pos).alias("__i", "bit"))
    marked = ex.join(
        F.broadcast(bits.withColumn("__hit", F.lit(1))), "bit", "left"
    )
    # count("*") (all exploded positions), not lit(num_hashes): duplicate
    # probe rows collapse into one group with a multiple of k positions, and
    # the contract is "every position hit", not "exactly k hits".
    return (
        marked.groupBy(*probe.columns)
        .agg((F.count("__hit") == F.count("*")).alias("might_contain"))
    )


# ----------------------------------------------------------------- frequent

def frequent_items(
    df: DataFrame, item_col: str, threshold: int
) -> DataFrame:
    """Heavy hitters with count >= threshold (exact-mode Misra-Gries)."""
    return (
        df.groupBy(item_col)
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= threshold)
    )


# ----------------------------------------------------------------- hll

def hll_distinct(df: DataFrame, group_cols: list[str], value_col: str, rsd: float = 0.016) -> DataFrame:
    """HLL++ distinct count per group (rsd 0.016 ≙ lg_k=12, hll/sketch.rs:73-75)."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd).alias("approx_distinct")
    )
