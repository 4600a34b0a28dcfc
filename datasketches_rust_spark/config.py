"""Pipeline configuration + the seed-compatibility fingerprint.

The reference enforces that set operations only combine sketches built with
the same hash seed, via a 16-bit seed hash carried in every serialized
sketch (``/root/reference/datasketches/src/hash/seed.rs:30-55``; default
update seed 9001 at ``hash/mod.rs:83``). Our analog is ``cfg_hash``: a
64-bit fingerprint of every parameter that affects signature values
(tokenizer version, shingle width, seed, k, banding), carried as a column
through checkpoints and asserted on resume / before any signature join.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from .sigkit.xxhash import xxh64_str_list

DEFAULT_SEED = 9001  # reference DEFAULT_UPDATE_SEED (hash/mod.rs:83)
MAX_THETA63 = (1 << 63) - 1  # i64::MAX, thetafamily/common/constants.rs:21

TOKEN_REGEX = "[A-Za-z0-9_]+"  # tokenizer v1: identifier runs (ASCII)


@dataclass(frozen=True)
class PipelineConfig:
    """Everything that affects signature bytes. Frozen; hash it, don't mutate."""

    seed: int = DEFAULT_SEED
    shingle_width: int = 5
    kmv_k: int = 256  # bottom-k signature size (theta nominal k)
    num_bands: int = 32  # LSH bands b
    band_rows: int = 6  # minhash rows per band r (num_perm = b*r = 192)
    jaccard_threshold: float = 0.8
    tokenizer_version: str = "v1"
    # skew handling: LSH buckets larger than this are salted/capped
    max_bucket_size: int = 200
    # substring-dedup rolling window (chars)
    substr_window: int = 32
    # rep-payload strategy (execution only — never in cfg_hash): True
    # broadcasts the narrow (content_sha, rep_file_id) key set into the
    # signature scan so the 2KB kmv/band payload never crosses an
    # exchange; False falls back to a materialized shuffle-hash reps
    # stage. None (default) = AUTO: the pipeline decides from the actual
    # rep-key count after the rep_keys stage materializes — broadcast iff
    # n_keys <= broadcast_key_limit — so a job approaching driver
    # capacity degrades to the shuffle path instead of OOMing on a knob
    # nobody flipped (round-4 ADVICE #3).
    broadcast_rep_payload: bool | None = None
    # auto-mode ceiling for the broadcast key set: ~100 B/row, so 15M keys
    # ≈ 1.5 GB — comfortable under an 8g driver and Spark's 8 GB
    # broadcast-table cap with room for the collect + block copies
    broadcast_key_limit: int = 15_000_000

    @property
    def num_perm(self) -> int:
        return self.num_bands * self.band_rows

    def cfg_hash(self) -> int:
        """Signed-64 fingerprint of the signature-affecting parameters."""
        key = "|".join(
            str(x)
            for x in (
                "dsrs-spark",
                self.tokenizer_version,
                self.seed,
                self.shingle_width,
                self.kmv_k,
                self.num_bands,
                self.band_rows,
            )
        )
        h = int(xxh64_str_list([key], seed=0)[0])
        return h - (1 << 64) if h >= (1 << 63) else h

    def with_(self, **kw) -> "PipelineConfig":
        return replace(self, **kw)


DEFAULT_CONFIG = PipelineConfig()
