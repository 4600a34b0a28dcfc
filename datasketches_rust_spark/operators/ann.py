"""Similarity search over embedding columns.

``ann_topk_bruteforce``: exact cosine top-k of a (small) query set against
the corpus — broadcast cross join + JVM fold for the dot product + window
top-k. This is the oracle-checkable baseline; it stays entirely in
whole-stage codegen (``zip_with``/``aggregate`` expressions, no UDF).

``ann_topk_lsh``: the scale path — random-hyperplane (SimHash) bucketing
of vectors; queries only score candidates sharing a hyperplane-sign band,
turning the cross join into an equi-join. Probabilistic recall; the
brute-force op is its correctness oracle at test scale.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window, functions as F


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def ann_topk_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank, cosine) — exact top-k by cosine.

    Cosine is rounded to 9 decimals before ranking and ties break on
    neighbor id, so the ranking is reproducible across engines.
    """
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__v"),
    ).withColumn("__vn", _norm(F.col("__v")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("__q"),
    ).withColumn("__qn", _norm(F.col("__q")))

    scored = (
        v.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("__q"), F.col("__v")) / (F.col("__qn") * F.col("__vn")), 9
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _sign_bands(vec_col: Column, planes: np.ndarray, band_bits: int) -> Column:
    """Array of band codes: hyperplane sign bits grouped band_bits at a time."""
    n_planes = planes.shape[0]
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    _as_double(vec_col),
                    F.array([F.lit(float(w)) for w in planes[i]]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for i in range(n_planes)
    ]
    bands = []
    for b in range(n_planes // band_bits):
        code = F.lit(0)
        for j in range(band_bits):
            code = code * 2 + bits[b * band_bits + j]
        bands.append((code + F.lit(b * (1 << band_bits))).cast("long"))
    return F.array(bands)


def embedding_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 32,
    band_bits: int = 8,
    seed: int = 9001,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= threshold).

    Scale path: random-hyperplane LSH self-join for candidates (a pair at
    cosine c collides per band with prob ((1 - acos(c)/pi)^band_bits), then
    exact cosine verify — the embedding analog of MinHash-LSH + Jaccard
    verify."""
    planes = _hyperplanes(dim, n_planes, seed)
    vb = vectors.select(
        F.col(id_col).alias("__id"),
        _as_double(F.col(vec_col)).alias("__v"),
        F.explode(_sign_bands(F.col(vec_col), planes, band_bits)).alias("__band"),
    ).withColumn("__n", _norm(F.col("__v")))
    a, b = vb.alias("a"), vb.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band")) & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__v").alias("va"),
            F.col("b.__v").alias("vb"),
            F.col("a.__n").alias("na"),
            F.col("b.__n").alias("nb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.select(
            F.col("id_a").alias(f"{id_col}_a"),
            F.col("id_b").alias(f"{id_col}_b"),
            F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 9).alias(
                "cosine"
            ),
        )
        .where(F.col("cosine") >= threshold)
    )


def ann_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 32,
    band_bits: int = 8,
    seed: int = 9001,
) -> DataFrame:
    """Approximate cosine top-k: candidates share >= 1 hyperplane-sign band."""
    planes = _hyperplanes(dim, n_planes, seed)

    vb = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__v"),
        F.explode(_sign_bands(F.col(vec_col), planes, band_bits)).alias("__band"),
    ).withColumn("__vn", _norm(F.col("__v")))
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("__q"),
        F.explode(_sign_bands(F.col(vec_col), planes, band_bits)).alias("__band"),
    ).withColumn("__qn", _norm(F.col("__q")))

    cands = (
        vb.join(qb, "__band")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "__q", "__v", "__qn", "__vn")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        F.round(_dot(F.col("__q"), F.col("__v")) / (F.col("__qn") * F.col("__vn")), 9).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
