"""Bounded-memory sketch aggregates in Spark's partial→final shape.

Both aggregates follow the reference's map-then-merge model exactly:
per-input-partition sketches are built in a tight numpy kernel
(``mapInPandas`` — no shuffle), serialized as array columns, then merged
per group with the sketch's commutative ``merge`` (``applyInPandas`` after
a shuffle of *sketches*, not raw rows). Shuffle volume is O(groups ×
sketch size), independent of input rows — the entire point of sketches at
100 TB.

- ``tdigest_agg``: sigkit.tdigest (TDigestMut semantics, tdigest/sketch.rs)
- ``frequent_items_agg``: sigkit.frequencies (FrequentItemsSketch
  semantics, frequencies/sketch.rs)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..sigkit.frequencies import MisraGries
from ..sigkit.tdigest import TDigest

_GRP = "__grp"


def _quantile_col_name(q: float) -> str:
    """Injective default name: p50, p90, p99, p99_9, p12_5, ...

    ``round(q*100)`` collides (0.999 and 1.0 both → p100; banker's rounding
    maps 0.125 and 0.135 both → p12), so keep every significant decimal and
    replace the point with an underscore.
    """
    s = format(q * 100, ".10f").rstrip("0").rstrip(".")
    return "p" + s.replace(".", "_").replace("-", "m")


def _with_group(df: DataFrame, group_cols: list[str]) -> tuple[DataFrame, list[str]]:
    if group_cols:
        return df, group_cols
    return df.withColumn(_GRP, F.lit(0)), [_GRP]


def _gschema(base: DataFrame, gcols: list[str]) -> str:
    return ", ".join(f"{c} {base.schema[c].dataType.simpleString()}" for c in gcols)


def _tdigest_partials(
    base: DataFrame, gcols: list[str], delta: float
) -> tuple[DataFrame, str]:
    """Per-input-partition digests: (group..., means, weights) rows —
    the shared partial stage of tdigest_agg / tdigest_sketch_agg.
    Returns (partials_df, row_schema) so callers never restate the
    stored-digest schema string."""
    part_schema = f"{_gschema(base, gcols)}, means array<double>, weights array<double>"

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        digests: dict = {}
        for pdf in batches:
            for key, sub in pdf.groupby(gcols, sort=False):
                key = key if isinstance(key, tuple) else (key,)
                d = digests.setdefault(key, TDigest(delta))
                d.update_batch(sub["__v"].to_numpy())
        rows = []
        for key, d in digests.items():
            m, w = d.to_rows()
            rows.append((*key, m, w))
        yield pd.DataFrame(rows, columns=[*gcols, "means", "weights"])

    return base.mapInPandas(partials, part_schema), part_schema


def _merged_tdigest(pdf: pd.DataFrame, delta: float, m_col: str = "means", w_col: str = "weights") -> TDigest:
    """Buffer-then-compress merge of stored digest rows
    (tdigest/sketch.rs:235-259) instead of P sequential merges."""
    return TDigest.from_rows(
        delta,
        np.concatenate(
            [np.asarray(m, dtype=np.float64) for m in pdf[m_col]] or [np.empty(0, np.float64)]
        ),
        np.concatenate(
            [np.asarray(w, dtype=np.float64) for w in pdf[w_col]] or [np.empty(0, np.float64)]
        ),
    )


def _mg_partials(
    base: DataFrame, gcols: list[str], max_map_size: int, item_t: str
) -> tuple[DataFrame, str]:
    """Per-input-partition Misra-Gries states — the shared partial stage
    of frequent_items_agg / frequent_items_sketch_agg. ``item_t`` is the
    item column's NATIVE Spark type (carried through the partial schema —
    the reference sketch is generic over T, frequencies/sketch.rs:96, so
    long/binary items round-trip without a lossy string cast). Returns
    (partials_df, row_schema)."""
    part_schema = (
        f"{_gschema(base, gcols)}, items array<{item_t}>, counts array<long>, offset long, weight long"
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sk: dict = {}
        for pdf in batches:
            for key, sub in pdf.groupby(gcols, sort=False):
                key = key if isinstance(key, tuple) else (key,)
                s = sk.setdefault(key, MisraGries(max_map_size))
                s.update_batch(sub["__it"].to_numpy(), sub["__w"].to_numpy())
        rows = []
        for key, s in sk.items():
            items, counts, off, wt = s.to_rows()
            rows.append((*key, items, counts, off, wt))
        yield pd.DataFrame(rows, columns=[*gcols, "items", "counts", "offset", "weight"])

    return base.mapInPandas(partials, part_schema), part_schema


def _merged_mg(pdf: pd.DataFrame, max_map_size: int) -> MisraGries:
    """Itemwise-add merge of stored MG rows (frequencies/sketch.rs:358-371)."""
    s = MisraGries(max_map_size)
    for items, counts, off, wt in zip(pdf["items"], pdf["counts"], pdf["offset"], pdf["weight"]):
        s.merge(MisraGries.from_rows(max_map_size, items, counts, off, wt))
    return s



def tdigest_agg(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: list[float],
    delta: float = 200.0,
    col_names: list[str] | None = None,
) -> DataFrame:
    """(group..., p50 double, p90 double, ...) via distributed t-digest.

    One scalar double column per requested quantile (named ``p{100q}`` by
    default) — flat, hashable rows, mirroring the exact-percentile
    ``tdigest_quantiles`` shape. With delta > pi * n the k1 cap never lets
    two points merge, every centroid stays a singleton and the interpolated
    quantile is exact (and SQL-expressible). Round with F.round downstream
    (Python round() is banker's; SQL round is half-away-from-zero).
    """
    if col_names is None:
        col_names = [_quantile_col_name(q) for q in quantiles]
    if len(set(col_names)) != len(col_names):
        raise ValueError(f"duplicate quantile column names: {col_names}")
    df, gcols = _with_group(df, group_cols)
    base = df.select(*gcols, F.col(value_col).cast("double").alias("__v"))
    part, _ = _tdigest_partials(base, gcols, delta)
    out_schema = _gschema(base, gcols) + ", " + ", ".join(f"{c} double" for c in col_names)

    def final(key, pdf: pd.DataFrame) -> pd.DataFrame:
        d = _merged_tdigest(pdf, delta)
        qs = [d.quantile(q) for q in quantiles]
        return pd.DataFrame([(*key, *qs)], columns=[*gcols, *col_names])

    out = part.groupBy(*gcols).applyInPandas(final, out_schema)
    return out.drop(_GRP) if not group_cols else out


def tdigest_sketch_agg(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    delta: float = 200.0,
) -> DataFrame:
    """(group..., means array<double>, weights array<double>) — ONE stored
    mergeable t-digest per group, the sketch-warehouse storable form
    (TDigest serialized state; tdigest/sketch.rs centroids). Pair with
    ``tdigest_merge_agg`` to re-aggregate stored digests later without
    rescanning raw values.
    """
    df, gcols = _with_group(df, group_cols)
    base = df.select(*gcols, F.col(value_col).cast("double").alias("__v"))
    part, part_schema = _tdigest_partials(base, gcols, delta)

    def final(key, pdf: pd.DataFrame) -> pd.DataFrame:
        m, w = _merged_tdigest(pdf, delta).to_rows()
        return pd.DataFrame([(*key, m, w)], columns=[*gcols, "means", "weights"])

    out = part.groupBy(*gcols).applyInPandas(final, part_schema)
    return out.drop(_GRP) if not group_cols else out


def tdigest_merge_agg(
    df: DataFrame,
    group_cols: list[str],
    quantiles: list[float],
    delta: float = 200.0,
    means_col: str = "means",
    weights_col: str = "weights",
    col_names: list[str] | None = None,
) -> DataFrame:
    """Merge the N stored t-digests in each group — the reference's
    buffer-then-compress merge (tdigest/sketch.rs:235-259) as a grouped
    aggregate over (means, weights) array columns — and evaluate the
    requested quantiles. Shuffle volume is O(groups × delta centroids),
    independent of the raw rows the stored digests summarized.
    """
    if col_names is None:
        col_names = [_quantile_col_name(q) for q in quantiles]
    if len(set(col_names)) != len(col_names):
        raise ValueError(f"duplicate quantile column names: {col_names}")
    df, gcols = _with_group(df, group_cols)
    base = df.select(
        *gcols, F.col(means_col).alias("__m"), F.col(weights_col).alias("__w")
    )
    out_schema = _gschema(base, gcols) + ", " + ", ".join(f"{c} double" for c in col_names)

    def final(key, pdf: pd.DataFrame) -> pd.DataFrame:
        d = _merged_tdigest(pdf, delta, "__m", "__w")
        qs = [d.quantile(q) for q in quantiles]
        return pd.DataFrame([(*key, *qs)], columns=[*gcols, *col_names])

    out = base.groupBy(*gcols).applyInPandas(final, out_schema)
    return out.drop(_GRP) if not group_cols else out


def frequent_items_sketch_agg(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    max_map_size: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """(group..., items, counts, offset, weight) — ONE stored Misra-Gries
    sketch per group (FrequentItemsSketch serialized state), the storable
    counterpart of ``frequent_items_agg``; re-aggregate later with
    ``frequent_items_merge_agg``. The stored ``items`` array keeps the
    item column's native type (long items stay long, binary stays
    binary)."""
    df, gcols = _with_group(df, group_cols)
    item_t = df.schema[item_col].dataType.simpleString()
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    base = df.select(*gcols, F.col(item_col).alias("__it"), w.alias("__w"))
    part, part_schema = _mg_partials(base, gcols, max_map_size, item_t)

    def final(key, pdf: pd.DataFrame) -> pd.DataFrame:
        items, counts, off, wt = _merged_mg(pdf, max_map_size).to_rows()
        return pd.DataFrame(
            [(*key, items, counts, off, wt)],
            columns=[*gcols, "items", "counts", "offset", "weight"],
        )

    out = part.groupBy(*gcols).applyInPandas(final, part_schema)
    return out.drop(_GRP) if not group_cols else out


def frequent_items_merge_agg(
    df: DataFrame,
    group_cols: list[str],
    max_map_size: int = 256,
    threshold_weight: int | None = None,
    no_false_negatives: bool = True,
) -> DataFrame:
    """Merge the N stored Misra-Gries sketches in each group — itemwise
    count addition + offset addition (frequencies/sketch.rs:358-371) —
    and run the threshold query under the chosen error type. Input rows
    carry (items, counts, offset, weight) columns as produced by
    ``frequent_items_sketch_agg``; the output ``item`` column keeps the
    stored items' native element type."""
    df, gcols = _with_group(df, group_cols)
    item_t = df.schema["items"].dataType.elementType.simpleString()
    base = df.select(*gcols, "items", "counts", "offset", "weight")
    out_schema = f"{_gschema(base, gcols)}, item {item_t}, count_lb long, count_ub long"

    def final(key, pdf: pd.DataFrame) -> pd.DataFrame:
        s = _merged_mg(pdf, max_map_size)
        return _threshold_rows(s, gcols, key, threshold_weight, no_false_negatives)

    out = base.groupBy(*gcols).applyInPandas(final, out_schema)
    return out.drop(_GRP) if not group_cols else out


def _threshold_rows(s, gcols, key, threshold_weight, no_false_negatives) -> pd.DataFrame:
    """Threshold query over a merged MG state (frequencies/sketch.rs:
    421-436): threshold clamped to max(threshold, offset), then STRICT
    upper_bound > t (NoFalseNegatives) / lower_bound > t
    (NoFalsePositives), matching the reference's inequalities exactly."""
    thr = max(threshold_weight, s.maximum_error()) if threshold_weight is not None else s.maximum_error()
    ub = s.counts + s.offset
    keep = (ub > thr) if no_false_negatives else (s.counts > thr)
    return pd.DataFrame(
        {
            **{c: [k] * int(keep.sum()) for c, k in zip(gcols, key)},
            "item": s.items[keep],
            "count_lb": s.counts[keep],
            "count_ub": ub[keep],
        }
    )


def frequent_items_agg(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    max_map_size: int = 256,
    threshold_weight: int | None = None,
    weight_col: str | None = None,
    no_false_negatives: bool = True,
) -> DataFrame:
    """Heavy hitters per group via distributed Misra-Gries.

    Output rows: (group..., item, count_lb, count_ub) for items passing the
    threshold under the chosen error type (frequencies/sketch.rs:421-436):
    the threshold is clamped to max(threshold, offset), then
    ``no_false_negatives=True`` keeps items whose UPPER bound is STRICTLY
    > threshold (every true heavy hitter reported, some light items may
    slip in); ``False`` is ErrorType::NoFalsePositives — LOWER bound >
    threshold, so every reported item is guaranteed heavy, some true
    hitters may be missed. In exact mode (no purges, offset 0) the two
    coincide. Threshold defaults to the sketch's maximum_error (= offset).
    The ``item`` column keeps the input column's native type.
    """
    df, gcols = _with_group(df, group_cols)
    item_t = df.schema[item_col].dataType.simpleString()
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    base = df.select(*gcols, F.col(item_col).alias("__it"), w.alias("__w"))
    part, _ = _mg_partials(base, gcols, max_map_size, item_t)
    out_schema = f"{_gschema(base, gcols)}, item {item_t}, count_lb long, count_ub long"

    def final(key, pdf: pd.DataFrame) -> pd.DataFrame:
        s = _merged_mg(pdf, max_map_size)
        return _threshold_rows(s, gcols, key, threshold_weight, no_false_negatives)

    out = part.groupBy(*gcols).applyInPandas(final, out_schema)
    return out.drop(_GRP) if not group_cols else out
