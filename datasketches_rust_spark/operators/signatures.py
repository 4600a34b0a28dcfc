"""Stage 1 — per-file signatures, map-side only (no shuffle).

The reference's build path (`/root/reference/datasketches/src/thetafamily/
theta/sketch.rs:128-130`: update → hash → theta-screen → k-min table) runs
here as one ``mapInPandas`` pass: each Arrow batch of files is tokenized,
shingled, hashed and reduced to

- ``minhash_kmv``: sorted k smallest distinct 63-bit shingle hashes — the
  ordered CompactThetaSketch form (theta/sketch.rs:321-332);
- ``theta64``: (k+1)-th smallest hash or i64::MAX in exact mode
  (common/hash_table.rs:388-401);
- ``simhash64`` + ``bands``: SimHash fingerprint and OPH/LSH band hashes
  from the *same* shingle hash stream (hashing paid once, hll/mod.rs:170-175);
- ``cfg_hash``: the seed-compatibility fingerprint (hash/seed.rs:30-55).

``file_id``/``content_sha`` are computed JVM-side with ``F.sha2`` (stays in
whole-stage codegen); only the numeric kernel crosses into Arrow.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..config import PipelineConfig
from ..sigkit.kmv import kmv_signatures
from ..sigkit.oph import band_hashes, oph_minhashes
from ..sigkit.simhash import simhash64
from ..sigkit.tokenize import shingle_hashes

SIGNATURE_SCHEMA = (
    "file_id string, content_sha string, "
    "n_shingles long, minhash_kmv array<long>, theta64 long, "
    "simhash64 long, bands array<long>, cfg_hash long"
)


def signature_batch(pdf: pd.DataFrame, cfg: PipelineConfig) -> pd.DataFrame:
    """Pure-pandas signature kernel for one Arrow batch (testable solo)."""
    texts = pdf["content"].tolist()
    vals, offs = shingle_hashes(texts, cfg.shingle_width, cfg.seed)
    sig_vals, sig_offs, theta, n_distinct = kmv_signatures(vals, offs, cfg.kmv_k)
    sim = simhash64(vals, offs)
    mh = oph_minhashes(vals, offs, cfg.num_perm, cfg.seed)
    bh = band_hashes(mh, cfg.num_bands, cfg.band_rows, cfg.seed)

    sig_i64 = sig_vals.astype(np.int64)
    nonempty = n_distinct > 0
    return pd.DataFrame(
        {
            "file_id": pdf["file_id"].to_numpy(),
            "content_sha": pdf["content_sha"].to_numpy(),
            "n_shingles": n_distinct,
            "minhash_kmv": [
                sig_i64[sig_offs[i]: sig_offs[i + 1]] for i in range(len(pdf))
            ],
            "theta64": theta,
            "simhash64": sim,
            "bands": [bh[i] if nonempty[i] else np.empty(0, np.int64) for i in range(len(pdf))],
            "cfg_hash": np.full(len(pdf), cfg.cfg_hash(), dtype=np.int64),
        }
    )


def compute_signatures(corpus: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """corpus(repo, path, commit, lang, content) → signature table.

    Map-side only: the plan is Scan → Project(sha2, codegen) →
    MapInPandas — zero exchanges, so it scales linearly with input splits.
    """
    with_ids = corpus.select(
        F.sha2(F.concat_ws("\x00", "repo", "path", "commit"), 256).alias("file_id"),
        F.sha2(F.col("content"), 256).alias("content_sha"),
        "content",
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield signature_batch(pdf, cfg)

    return with_ids.mapInPandas(run, schema=SIGNATURE_SCHEMA)
