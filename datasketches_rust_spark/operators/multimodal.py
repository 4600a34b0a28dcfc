"""Multimodal (image/audio/video) column plumbing.

Media assets are opaque ``binary`` columns with a typed metadata struct —
the Spark-side contract a 100 TB training-data pipeline needs: schema,
Arrow batch shape, partitioning and fan-out are all real; only the codec
call itself is stubbed (the sandbox has no image/audio libraries).

- :func:`attach_media_meta` — sniff container format + sizes from magic
  bytes (real, vectorized).
- :func:`extract_features` — mapInPandas over Arrow batches producing a
  fixed-dim feature vector per asset. ``decoder="stub"`` raises
  NotImplementedError at the exact seam where PIL/ffmpeg would plug in;
  ``decoder="fake"`` produces a *deterministic* byte-statistics vector so
  the full pipeline (including dedup over media features) is testable.
- :func:`frame_sample_plan` — deterministic frame-index sampling for video
  rows (pure arithmetic on metadata, no decode needed).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

MEDIA_SCHEMA = "struct<format string, n_bytes long, magic string>"

_MAGICS = [
    ("89504e47", "png"),
    ("ffd8ff", "jpeg"),
    ("47494638", "gif"),
    ("52494646", "riff"),  # wav/avi container
    ("494433", "mp3"),
    ("000000", "mp4-ish"),
]


def attach_media_meta(df: DataFrame, binary_col: str) -> DataFrame:
    """Add a typed metadata struct sniffed from the binary column (JVM)."""
    b = F.col(binary_col)
    magic = F.lower(F.hex(F.substring(b, 1, 4)))
    fmt = F.lit("unknown")
    for prefix, name in reversed(_MAGICS):
        fmt = F.when(magic.startswith(prefix.upper()) | magic.startswith(prefix), F.lit(name)).otherwise(fmt)
    return df.withColumn(
        "media_meta",
        F.struct(
            fmt.alias("format"),
            F.length(b).cast("long").alias("n_bytes"),
            magic.alias("magic"),
        ),
    )


FEATURE_DIM = 16


def _fake_decode_features(blobs: pd.Series) -> np.ndarray:
    """Deterministic byte-statistics 'features' standing in for a decoder.

    Real deployment replaces this with PIL/torchaudio/ffmpeg decode +
    model features; the Spark plumbing (batch shape, schema, partitioning)
    is identical.
    """
    out = np.zeros((len(blobs), FEATURE_DIM), dtype=np.float64)
    for i, blob in enumerate(blobs):
        a = np.frombuffer(bytes(blob), dtype=np.uint8)
        if len(a) == 0:
            continue
        hist = np.bincount(a >> 4, minlength=16).astype(np.float64)
        out[i] = hist / hist.sum()
    return out


def extract_features(
    df: DataFrame, binary_col: str, id_col: str, decoder: str = "fake"
) -> DataFrame:
    """(id, features array<double>) per asset via Arrow-batched decode."""
    id_t = df.select(id_col).schema[0].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "stub":
                raise NotImplementedError(
                    "media decode requires an image/audio codec library; "
                    "plug PIL/torchaudio in here (operators/multimodal.py)"
                )
            feats = _fake_decode_features(pdf[binary_col])
            yield pd.DataFrame(
                {"__id": pdf[id_col], "features": list(feats)}
            )

    return (
        df.select(id_col, binary_col)
        .mapInPandas(run, f"__id {id_t}, features array<double>")
        .withColumnRenamed("__id", id_col)
    )


def frame_sample_plan(
    df: DataFrame,
    id_col: str,
    n_frames_col: str,
    sample_every: int = 30,
    max_frames: int = 8,
) -> DataFrame:
    """Deterministic frame indices to decode per video (pure JVM)."""
    n = F.col(n_frames_col).cast("long")
    idx = F.slice(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(sample_every)),
        1,
        max_frames,
    )
    return df.select(F.col(id_col), idx.alias("frame_indices"))
