"""End-to-end dedup pipeline tests on the deterministic corpus.

Correctness anchors (SURVEY.md §5 carry-over):
- per-row invariant: sha256(content) from the generator == Spark F.sha2;
- dup-pair recall >= 0.99 vs the exact-Jaccard oracle at true J >= 0.8;
- no false merges across unrelated families (boilerplate trap);
- resume: second run with same checkpoint dir reuses every stage and
  produces identical clusters.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from datasketches_rust_spark.config import PipelineConfig
from datasketches_rust_spark.corpus.generator import (
    content_sha_pandas,
    corpus_spark,
    gen_batch,
    truth_families,
    truth_pairs,
)
from datasketches_rust_spark.plans.pipeline import DedupPipeline

N_FILES = 2000
SEED = 42
CFG = PipelineConfig()


@pytest.fixture(scope="module")
def corpus(spark):
    return corpus_spark(spark, N_FILES, seed=SEED, partitions=8).cache()


@pytest.fixture(scope="module")
def clusters_pdf(spark, corpus):
    pipe = DedupPipeline(spark, CFG)
    clusters = pipe.run(corpus.drop("file_seq"))
    # map back to generator ids for truth joins
    ids = corpus.select(
        F.sha2(F.concat_ws("\x00", "repo", "path", "commit"), 256).alias("file_id"),
        "file_seq",
    )
    return clusters.join(ids, "file_id").toPandas()


def test_per_row_invariant_sha256(spark, corpus):
    """Generator-recorded sha256(content) == Spark F.sha2(content, 256)."""
    spark_shas = (
        corpus.select("file_seq", F.sha2("content", 256).alias("sha"))
        .orderBy("file_seq")
        .toPandas()
    )
    local = gen_batch(np.arange(N_FILES), SEED)
    local_shas = content_sha_pandas(local["content"])
    assert (spark_shas["sha"].to_numpy() == local_shas.to_numpy()).all()


def test_recall_against_exact_jaccard_oracle(clusters_pdf):
    truth = truth_pairs(SEED, N_FILES)
    must = truth[truth.true_jaccard >= CFG.jaccard_threshold]
    cl = clusters_pdf.set_index("file_seq")["cluster_id"]
    same = (cl.loc[must.seq_a].to_numpy() == cl.loc[must.seq_b].to_numpy())
    recall = same.mean()
    assert recall >= 0.99, f"recall {recall:.4f} over {len(must)} truth pairs"


def test_no_false_merges_across_families(clusters_pdf):
    """Boilerplate-trap files (shared 20-line license header, unrelated
    bodies) must not cluster together, and clusters must not span
    unrelated families in general."""
    fams = truth_families(N_FILES)
    df = clusters_pdf.merge(fams, on="file_seq")
    traps = df[df.klass == "boilerplate"]
    sizes = traps.groupby("cluster_id").size()
    assert (sizes == 1).all(), "boilerplate files merged into a cluster"
    # any cluster containing >1 family must be explainable by a truth pair
    # with true J >= 0.5 (borderline links); unrelated merges are bugs
    multi = df.groupby("cluster_id")["family"].nunique()
    bad_clusters = multi[multi > 1].index
    truth = truth_pairs(SEED, N_FILES)
    linked = set(map(tuple, truth[truth.true_jaccard >= 0.5][["seq_a", "seq_b"]].values))
    for cid in bad_clusters:
        members = df[df.cluster_id == cid]
        fams_in = members.family.unique()
        # every pair of families in the cluster needs some linking evidence
        for i, fa in enumerate(fams_in):
            for fb in fams_in[i + 1:]:
                a_ids = members[members.family == fa].file_seq
                b_ids = members[members.family == fb].file_seq
                found = any(
                    (min(x, y), max(x, y)) in linked for x in a_ids for y in b_ids
                )
                assert found, f"cluster {cid[:12]} merges unrelated families {fa},{fb}"


def test_exact_dup_mega_family_single_cluster(clusters_pdf):
    """ids 0..63 are byte-identical → exactly one cluster (skew path)."""
    mega = clusters_pdf[clusters_pdf.file_seq < 64]
    assert mega.cluster_id.nunique() == 1
    assert mega.content_sha.nunique() == 1


def test_checkpoint_resume_identical_and_reused(spark, corpus, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    pipe1 = DedupPipeline(spark, CFG, checkpoint_dir=ckpt)
    out1 = pipe1.run(corpus.drop("file_seq")).orderBy("file_id").toPandas()

    pipe2 = DedupPipeline(spark, CFG, checkpoint_dir=ckpt)
    out2 = pipe2.run(corpus.drop("file_seq")).orderBy("file_id").toPandas()
    pd.testing.assert_frame_equal(out1, out2)

    metrics = spark.read.parquet(f"{ckpt}/_metrics").toPandas()
    second = metrics[metrics.reused]
    # every stage of the second run resumed from checkpoint
    assert set(second.stage) >= {"signatures", "rep_keys", "candidates", "verified", "clusters"}

    # config change breaks the fingerprint chain → stages recompute
    pipe3 = DedupPipeline(spark, CFG.with_(kmv_k=128), checkpoint_dir=ckpt)
    pipe3.run(corpus.drop("file_seq"))
    m3 = spark.read.parquet(f"{ckpt}/_metrics").toPandas()
    assert not m3[m3.input_fingerprint.str.startswith(str(CFG.with_(kmv_k=128).cfg_hash()))].reused.any()


def test_hot_lsh_bucket_star_path(spark):
    """Hundreds of *distinct* near-identical contents (post-exact-collapse
    hot bucket) must exceed max_bucket_size, exercise the star path, and
    still form one cluster with full recall."""
    base = " ".join(f"tok{i}" for i in range(400))
    rows = []
    for i in range(300):
        # one unique token appended → distinct contents, J ≈ 396/398 ≈ 0.995
        rows.append((f"org/r{i}", f"src/f{i}.py", f"{i:040x}", "python",
                     base + f" unique_{i}"))
    for i in range(50):  # unrelated controls
        rows.append((f"org/u{i}", f"src/u{i}.py", f"{i:040x}", "python",
                     " ".join(f"zz{i}_{j}" for j in range(400))))
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    cfg = CFG.with_(max_bucket_size=50)  # force the star path
    out = DedupPipeline(spark, cfg).run(corpus).toPandas()
    near = out[out.file_id.isin(
        out.merge(corpus.select(
            F.sha2(F.concat_ws("\x00", "repo", "path", "commit"), 256).alias("file_id"),
            "path").toPandas(), on="file_id").query("path.str.startswith('src/f')").file_id
    )]
    assert near.cluster_id.nunique() == 1, "hot bucket must collapse to one cluster"
    ctrl = out[~out.file_id.isin(near.file_id)]
    assert ctrl.cluster_id.nunique() == len(ctrl), "controls must stay singletons"


def test_signature_stage_is_shuffle_free(spark, corpus):
    """The stage-1 physical plan must contain no Exchange (map-side only)."""
    from datasketches_rust_spark.operators.signatures import compute_signatures

    plan = compute_signatures(corpus.drop("file_seq"), CFG)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_rep_payload_attach_is_wide_shuffle_free(spark, corpus):
    """The broadcast payload attach must be a BroadcastHashJoin over the
    signature scan with NO hash-partitioning exchange — the wide kmv/band
    rows are scanned in place, never re-shuffled (round-3 VERDICT: the
    reps exchange was the pipeline's one bus-bound stage)."""
    from datasketches_rust_spark.operators.lsh import exact_rep_keys, rep_payload
    from datasketches_rust_spark.operators.signatures import compute_signatures

    sigs = compute_signatures(corpus.drop("file_seq"), CFG).localCheckpoint(eager=True)
    keys = exact_rep_keys(
        sigs.select("file_id", "content_sha")
    ).localCheckpoint(eager=True)
    attached = rep_payload(sigs, keys, ["bands"])
    plan = attached._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    # and it selects exactly the rep rows with the requested columns
    n_distinct = sigs.select("content_sha").distinct().count()
    assert attached.columns == ["content_sha", "bands"]
    assert attached.count() == n_distinct


def test_rep_payload_fallback_path_identical(spark, corpus):
    """cfg.broadcast_rep_payload=False (the big-key-set fallback: classic
    materialized shuffle-hash reps stage) must produce identical clusters."""
    a = (
        DedupPipeline(spark, CFG)
        .run(corpus.drop("file_seq"))
        .orderBy("file_id")
        .toPandas()
    )
    b = (
        DedupPipeline(spark, CFG.with_(broadcast_rep_payload=False))
        .run(corpus.drop("file_seq"))
        .orderBy("file_id")
        .toPandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_pipeline_containment_threads_ndocs_hint(spark, corpus, monkeypatch):
    """DedupPipeline.containment passes the ids stage's measured row count
    as containment_pairs' n_docs hint (round-4 VERDICT ask #7) — no
    sizing count() over the corpus — and matches the direct operator."""
    import datasketches_rust_spark.plans.pipeline as P
    from datasketches_rust_spark.operators.substring import (
        containment_pairs as direct_cp,
    )

    captured = {}
    orig = P.containment_pairs

    def spy(docs, **kw):
        captured.update(kw)
        return orig(docs, **kw)

    monkeypatch.setattr(P, "containment_pairs", spy)
    pipe = DedupPipeline(spark, CFG)
    c = corpus.drop("file_seq")
    out = {tuple(r) for r in pipe.containment(c).collect()}
    assert captured["n_docs"] == c.count()

    docs = c.selectExpr(
        "sha2(concat_ws('\x00', repo, path, commit), 256) AS file_id", "content"
    )
    expect = {
        tuple(r)
        for r in direct_cp(
            docs, id_col="file_id", text_col="content", window=CFG.substr_window
        ).collect()
    }
    assert out == expect


def test_rep_payload_auto_mode_resolves_from_key_count(spark, corpus):
    """broadcast_rep_payload=None derives the join side from the measured
    rep-key count (round-4 ADVICE #3: no static knob to forget): a limit
    below the key count forces the shuffle fallback, a comfortable limit
    keeps the broadcast path — both with identical clusters."""
    a = (
        DedupPipeline(spark, CFG.with_(broadcast_rep_payload=None))
        .run(corpus.drop("file_seq"))
        .orderBy("file_id")
        .toPandas()
    )
    forced_fallback = DedupPipeline(
        spark, CFG.with_(broadcast_rep_payload=None, broadcast_key_limit=1)
    )
    b = forced_fallback.run(corpus.drop("file_seq")).orderBy("file_id").toPandas()
    pd.testing.assert_frame_equal(a, b)
