"""End-to-end dedup pipeline: signatures → LSH → verify → clusters.

Mirrors the reference's map-then-merge contract at plan level: stage 1 is
the per-partition "update" kernel (map-side only), stages 2-4 are the
commutative merges (shuffle on content_sha / band keys), and every stage
boundary is a serialized compact form (parquet checkpoint ≙ the
CompactThetaSketch exchange path, theta/sketch.rs:443-491).

Checkpoint/resume: each stage writes to ``<dir>/<stage>`` plus a one-row
``_meta`` parquet carrying (stage, fingerprint). The fingerprint chains
cfg_hash with the upstream stage's fingerprint — the pipeline-level analog
of the reference's seed-hash compatibility check (hash/seed.rs:42-55): a
resumed run with a different config or different upstream refuses to reuse
the checkpoint and recomputes. ``_metrics`` accumulates per-stage row
counts (map-then-merge accounting, FIXTURES.md F5).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import PipelineConfig
from ..operators.connected_components import connected_components
from ..operators.lsh import (
    candidate_pairs,
    exact_pairs,
    exact_rep_keys,
    exact_representatives,
    has_duplicate_id_rows,
    rep_payload,
)
from ..operators.signatures import compute_signatures
from ..operators.substring import containment_pairs
from ..operators.verify import verify_pairs


class DedupPipeline:
    def __init__(
        self,
        spark: SparkSession,
        cfg: PipelineConfig | None = None,
        checkpoint_dir: str | None = None,
    ):
        self.spark = spark
        self.cfg = cfg or PipelineConfig()
        self.dir = checkpoint_dir
        self.metrics: list[tuple] = []  # (stage, rows_out, fingerprint, reused)

    # ------------------------------------------------------------ checkpoints

    def _meta_path(self, name: str) -> str:
        return f"{self.dir}/{name}__meta"

    def _stage(
        self, name: str, upstream_fp: str, compute, materialize: bool = True
    ) -> tuple[DataFrame, str]:
        """Run or resume one stage; returns (df, fingerprint)."""
        fp = f"{self.cfg.cfg_hash()}|{upstream_fp}|{name}"
        if self.dir is None:
            # no durable checkpoint: cut lineage EAGERLY so every downstream
            # consumer — including broadcast-subquery jobs, which Spark runs
            # before the main job and which would otherwise recompute the
            # whole upstream chain — reads this stage's materialized blocks
            # (measured: eager per-stage checkpoints beat the lazy variant
            # by ~35s on the 600k-file bench at 16 cores). Single-consumer
            # stages can opt out (materialize=False) and flow straight into
            # their consumer's aggregation.
            df = compute()
            if materialize:
                df = df.localCheckpoint(eager=True)
            return df, fp
        path = f"{self.dir}/{name}"
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            try:
                meta = self.spark.read.parquet(self._meta_path(name)).collect()
                if meta and meta[0]["fingerprint"] == fp:
                    df = self.spark.read.parquet(path)
                    self.metrics.append((name, df.count(), fp, True))
                    return df, fp
            except Exception:
                pass  # missing/corrupt meta → recompute
        df = compute()
        df.write.mode("overwrite").parquet(path)
        self.spark.createDataFrame(
            [(name, fp)], "stage string, fingerprint string"
        ).write.mode("overwrite").parquet(self._meta_path(name))
        out = self.spark.read.parquet(path)
        self.metrics.append((name, out.count(), fp, False))
        return out, fp

    def flush_metrics(self) -> None:
        if self.dir is None or not self.metrics:
            return
        self.spark.createDataFrame(
            self.metrics, "stage string, rows_out long, input_fingerprint string, reused boolean"
        ).write.mode("append").parquet(f"{self.dir}/_metrics")
        self.metrics = []

    # ------------------------------------------------------------ stages

    @staticmethod
    def file_ids(corpus: DataFrame) -> DataFrame:
        """(file_id, content_sha BINARY) — JVM-only (sha2), cheap to
        recompute; content_sha matches the signature table's binary key."""
        return corpus.select(
            F.sha2(F.concat_ws("\x00", "repo", "path", "commit"), 256).alias("file_id"),
            F.unhex(F.sha2(F.col("content"), 256)).alias("content_sha"),
        )

    def _dedup_stages(self, corpus: DataFrame, input_fp: str):
        """Shared stage chain up to verification.

        Returns (sigs, ids, rep_map, verified, fp4) where rep_map is the
        narrow (content_sha, rep_file_id) relation.

        Broadcast path (the common case): only the NARROW rep-key table
        is materialized; consumers re-attach the payload columns they
        need (candidates: bands; verify: kmv/theta/n_shingles) by
        broadcasting the key set into the already-materialized signature
        scan — the ~2KB-wide rows are scanned in place and never
        re-shuffled or re-materialized (round-3's reps exchange, the
        pipeline's one bus-bound stage, is gone). Fallback path: the
        classic materialized wide reps stage, for jobs whose key set
        exceeds broadcast capacity.

        cfg.broadcast_rep_payload=None (default) resolves AUTOMATICALLY
        from the measured rep-key count (<= cfg.broadcast_key_limit →
        broadcast): the count comes from the rep_keys stage's own
        materialization (checkpoint metrics, or one narrow job over the
        ~60 B/row cached blocks), so no extra corpus scan — and no static
        knob to forget as a job grows toward driver capacity.
        """
        # signatures feed several consumers (rep keys, payload attach, the
        # final file_id→cluster map) — materialize once so the kernel runs
        # once and the cluster stage never re-scans the raw corpus
        sigs, fp1 = self._stage(
            "signatures",
            input_fp,
            lambda: compute_signatures(corpus, self.cfg),
        )
        # narrow (file_id, content_sha) projection materialized ONCE: the
        # rep keys agg, the duplicate probe and the final cluster map are
        # all narrow consumers, and a row-cached wide table gives them no
        # column pruning — this 60B/row table does
        ids, _ = self._stage("ids", fp1, lambda: sigs.select("file_id", "content_sha"))
        # the duplicate-(sha,fid) probe and the rep-keys agg both read only
        # the materialized ids blocks and are independent — overlap them
        # (guide §2.6: actions are only sequential because the driver calls
        # them sequentially; the probe's tasks back-fill cores the keys
        # agg's tail leaves idle). Only in the no-checkpoint path: with a
        # checkpoint dir the probe stays LAZY so a resumed run skips it.
        probe_fut = None
        if self.dir is None and self.cfg.broadcast_rep_payload is not False:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=1)
            probe_fut = pool.submit(has_duplicate_id_rows, ids)
            pool.shutdown(wait=False)
        keys, fp2 = self._stage("rep_keys", fp1, lambda: exact_rep_keys(ids))
        broadcast = self.cfg.broadcast_rep_payload
        if broadcast is None:
            broadcast = self._stage_rows("rep_keys", keys) <= self.cfg.broadcast_key_limit
        # downstream stages see the RESOLVED decision (verify's cand-sha
        # semi-join pushdown gates on the same broadcast-capacity premise)
        rcfg = self.cfg.with_(broadcast_rep_payload=broadcast)
        if broadcast:
            # duplicate-(sha,fid) probe: lazy (or prefetched above) so
            # checkpoint resume skips it; at most one narrow job
            memo: dict = {}

            def payload() -> DataFrame:
                if "p" not in memo:
                    has_dups = (
                        probe_fut.result()
                        if probe_fut is not None
                        else has_duplicate_id_rows(ids)
                    )
                    memo["p"] = (
                        sigs.dropDuplicates(["content_sha", "file_id"])
                        if has_dups
                        else sigs
                    )
                return memo["p"]

            cands, fp3 = self._stage(
                "candidates",
                fp2,
                lambda: candidate_pairs(rep_payload(payload(), keys, ["bands"]), rcfg),
            )
            verified, fp4 = self._stage(
                "verified",
                fp3,
                lambda: verify_pairs(
                    cands,
                    rep_payload(payload(), keys, ["n_shingles", "minhash_kmv", "theta64"]),
                    rcfg,
                ),
            )
        else:
            reps, fp2b = self._stage(
                "reps", fp2, lambda: exact_representatives(sigs, ids, broadcast=False)
            )
            cands, fp3 = self._stage(
                "candidates", fp2b, lambda: candidate_pairs(reps, rcfg)
            )
            verified, fp4 = self._stage(
                "verified", fp3, lambda: verify_pairs(cands, reps, rcfg)
            )
        rep_map = keys.select("content_sha", "rep_file_id")
        return sigs, ids, rep_map, verified, fp4

    def _stage_rows(self, name: str, df: DataFrame) -> int:
        """Row count of a just-materialized stage: from the checkpoint
        metrics when available, else one narrow job over the stage's own
        cached blocks (~60 B/row for the key tables) — never a corpus
        rescan."""
        for stage, rows, *_ in reversed(self.metrics):
            if stage == name:
                return rows
        return df.count()

    def run(self, corpus: DataFrame, input_fp: str = "corpus") -> DataFrame:
        """corpus(repo,path,commit,lang,content) → clusters(file_id,
        content_sha, cluster_id). cluster_id = min content_sha in component;
        non-duplicated files map to their own content_sha."""
        _, ids, _, verified, fp4 = self._dedup_stages(corpus, input_fp)
        edges = (
            verified.where("accepted")
            .select(F.col("sha_a").alias("src"), F.col("sha_b").alias("dst"))
        )

        def compute_clusters():
            assign = connected_components(edges, checkpoint_dir=self.dir)
            return (
                ids
                .join(
                    assign.withColumnRenamed("node", "content_sha"),
                    "content_sha",
                    "left",
                )
                .select(
                    "file_id",
                    # render the binary keys as the usual lowercase hex at
                    # the output boundary (identical to sha2's text form)
                    F.lower(F.hex("content_sha")).alias("content_sha"),
                    F.lower(
                        F.hex(F.coalesce("component", "content_sha"))
                    ).alias("cluster_id"),
                )
            )

        clusters, _ = self._stage("clusters", fp4, compute_clusters)
        self.flush_metrics()
        return clusters

    def containment(
        self, corpus: DataFrame, input_fp: str = "corpus", prefilter: bool = True
    ) -> DataFrame:
        """Substring-containment pairs (file_id_contained, file_id_container)
        over the corpus — the suffix/substring dedup stage, run alongside
        the MinHash pipeline.

        Exemplar of the ``n_docs`` hint (operators/substring.py): the
        prefilter bloom is sized from the ids stage's measured row count
        (checkpoint ``_metrics`` or the stage's own cached blocks), so NO
        sizing ``count()`` job over the corpus appears in the plan. The
        signature/ids stages are shared with ``run()``/``dup_pairs()`` —
        checkpointed or cached once, reused by every consumer.
        """
        sigs, fp1 = self._stage(
            "signatures", input_fp, lambda: compute_signatures(corpus, self.cfg)
        )
        ids, _ = self._stage("ids", fp1, lambda: sigs.select("file_id", "content_sha"))
        docs = corpus.select(
            F.sha2(F.concat_ws("\x00", "repo", "path", "commit"), 256).alias("file_id"),
            F.col("content"),
        )
        return containment_pairs(
            docs,
            id_col="file_id",
            text_col="content",
            window=self.cfg.substr_window,
            prefilter=prefilter,
            n_docs=self._stage_rows("ids", ids),
        )

    def dup_pairs(self, corpus: DataFrame, input_fp: str = "corpus") -> DataFrame:
        """(file_id-level) exact + verified near-dup pairs — F3 schema."""
        _, ids, rep_map, verified, _ = self._dedup_stages(corpus, input_fp)
        near = (
            verified.where("accepted")
            .join(rep_map.withColumnRenamed("content_sha", "sha_a")
                  .withColumnRenamed("rep_file_id", "file_id_a"), "sha_a")
            .join(rep_map.withColumnRenamed("content_sha", "sha_b")
                  .withColumnRenamed("rep_file_id", "file_id_b"), "sha_b")
            .select(
                F.least("file_id_a", "file_id_b").alias("file_id_a"),
                F.greatest("file_id_a", "file_id_b").alias("file_id_b"),
                "jaccard_est",
                F.lit("near").alias("kind"),
            )
        )
        ex = exact_pairs(ids)
        self.flush_metrics()
        return ex.unionByName(near)
