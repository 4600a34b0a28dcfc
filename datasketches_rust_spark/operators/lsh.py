"""Stage 2 — LSH candidate generation with explicit skew handling.

Plan shape (all DataFrame ops, one logical shuffle on the band key):

1. **Exact-dedup first**: collapse byte-identical files to one
   representative per ``content_sha`` *before* LSH. Mega duplicate families
   (the classic source of LSH bucket skew — 10^6 copies of one license
   file) become a single node, so they cannot create hot buckets at all.
2. ``posexplode(bands)`` → ``(band, band_hash, content_sha)`` keys.
3. Bucket-size accounting (`groupBy(band, bhash).count()` — a partial-agg
   shuffle on the same key the join needs, so AQE reuses the exchange).
4. **Small buckets** (size ≤ cfg.max_bucket_size): all-pairs via self-join
   on (band, bhash) — AQE skew-join splits any residual hot key.
5. **Big buckets**: star expansion — every member pairs with the bucket
   minimum only. O(n) instead of O(n²) pairs; connectivity (what the
   downstream connected-components stage consumes) is preserved, because a
   bucket is a clique candidate and a star spans it.

The bucket cap is the same "decorrelate placement, bound the damage" move
as the reference's stride probing (common/hash_table.rs:425-427) and its
k-truncation of unions (common/union.rs:130-135): bound worst-case work at
a small, quantified accuracy cost — pair-level candidates lost by the star
are recovered at cluster level via the hub.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def exact_representatives(signatures: DataFrame) -> DataFrame:
    """One row per distinct content: min file_id is the representative."""
    return signatures.groupBy("content_sha").agg(
        F.min("file_id").alias("rep_file_id"),
        F.first("n_shingles").alias("n_shingles"),
        F.first("minhash_kmv").alias("minhash_kmv"),
        F.first("theta64").alias("theta64"),
        F.first("simhash64").alias("simhash64"),
        F.first("bands").alias("bands"),
        F.count("*").alias("n_copies"),
    )


def exact_pairs(signatures: DataFrame) -> DataFrame:
    """Star pairs inside each exact-duplicate group (J = 1 by definition).

    Emitted at file level: (file_id, rep) for every non-representative copy.
    """
    reps = signatures.groupBy("content_sha").agg(F.min("file_id").alias("rep_file_id"))
    return (
        signatures.join(reps, "content_sha")
        .where(F.col("file_id") != F.col("rep_file_id"))
        .select(
            F.col("rep_file_id").alias("file_id_a"),
            F.col("file_id").alias("file_id_b"),
            F.lit(1.0).alias("jaccard_est"),
            F.lit("exact").alias("kind"),
        )
    )


def candidate_pairs(reps: DataFrame, cfg) -> DataFrame:
    """Distinct candidate (content_sha_a < content_sha_b) pairs via LSH.

    Delegates skew handling to the shared cap+star machinery
    (operators/buckets.py) — one logical shuffle on the band key.
    """
    from .buckets import capped_bucket_pairs

    keys = reps.where(F.size("bands") > 0).select(
        "content_sha", F.posexplode("bands").alias("band", "bhash")
    )
    return capped_bucket_pairs(
        keys, ["band", "bhash"], "content_sha", cfg.max_bucket_size
    ).select(F.col("id_a").alias("sha_a"), F.col("id_b").alias("sha_b"))
