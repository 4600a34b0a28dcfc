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


def exact_representatives(signatures: DataFrame, ids: DataFrame | None = None) -> DataFrame:
    """One row per distinct content: min file_id is the representative.

    Deliberately NOT ``agg(first(minhash_kmv), ...)``: ``first()`` over
    array columns forces a SortAggregate, which sorts the full
    signature table (kmv arrays and all) twice — measured as the single
    largest shuffle cost of the pipeline. Instead the rep is chosen with
    a scalar-only HashAggregate (min file_id + count) and the payload
    re-attached by an equi-hash-join on (content_sha, file_id): same
    rows, no sort of the wide table. Identical contents have identical
    signatures, so which copy donates the payload is immaterial — the
    min-file_id row is picked for determinism.

    ``ids``: optional pre-materialized narrow (file_id, content_sha)
    projection. When the signature table is a row-cached localCheckpoint
    (the non-durable pipeline path), every narrow aggregation over it
    still scans the full 2KB rows — passing a materialized narrow
    projection makes the keys agg and the duplicate probe read ~60 bytes
    per row instead (the wide rows are then scanned exactly once, by the
    payload join). Parquet-checkpointed callers get the same effect from
    column pruning and can omit it.
    """
    ids = ids if ids is not None else signatures.select("content_sha", "file_id")
    keys = ids.groupBy("content_sha").agg(
        F.min("file_id").alias("rep_file_id"),
        F.count("*").alias("n_copies"),
    )
    # the SHUFFLE_HASH hint marks the BUILD side — it must be the narrow
    # keys relation (hash map of (sha, rep_id) rows), never the 2KB-wide
    # signature rows, whose per-partition build cannot spill and OOMs at
    # ~1.5M+ files
    # one-row-per-sha invariant: if the corpus carries duplicate
    # (repo, path, commit) rows, the rep's (sha, file_id) matches each copy
    # and the join emits one rep row per copy. An unconditional wide
    # dropDuplicates would fix it but forces a SortAggregate over the 2KB
    # signature rows (First() on binary/array buffers) — measured as
    # NEGATIVE 4→16-core scaling of this stage. Instead probe for
    # duplicates with a narrow 2-column agg (map-side combined, ~64 B/row
    # shuffle) and pay the wide dedup only on the rare input that needs it.
    # the probe groups on xxhash64(sha, fid) — one 8-byte key instead of
    # ~100 bytes of (binary sha + hex fid), measured 3x faster; a hash
    # collision can only create a false "duplicates exist" (triggering a
    # harmless unneeded dedup), never miss a real duplicate
    payload = signatures
    has_dups = (
        ids.groupBy(F.xxhash64("content_sha", "file_id").alias("__k"))
        .count()
        .where(F.col("count") > 1)
        .limit(1)
        .count()
        > 0
    )
    if has_dups:
        payload = signatures.dropDuplicates(["content_sha", "file_id"])
    s, k = payload.alias("s"), keys.alias("k").hint("shuffle_hash")
    return s.join(
        k,
        (F.col("s.content_sha") == F.col("k.content_sha"))
        & (F.col("s.file_id") == F.col("k.rep_file_id")),
    ).select(
        F.col("k.content_sha"),
        F.col("k.rep_file_id"),
        F.col("s.n_shingles"),
        F.col("s.minhash_kmv"),
        F.col("s.theta64"),
        F.col("s.simhash64"),
        F.col("s.bands"),
        F.col("k.n_copies"),
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
