"""Text analysis + exact n-gram dedup as pure JVM DataFrame expressions.

Everything here stays inside whole-stage codegen: tokenization is
``regexp_extract_all``, shingling is ``transform(sequence(...), slice)``,
Jaccard is a shingle-explode + self-join + group-count — no Python UDFs at
all, so these operators scale with Spark's native shuffle machinery.

Semantics match sigkit's kernel tokenizer (token = ``[A-Za-z0-9_]+`` run;
docs with 0 < n_tokens < width contribute one whole-sequence shingle) so
the exact path and the sketch path agree on what a "shingle" is.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..config import TOKEN_REGEX

EN_STOPWORDS = (
    "the of and to in a is that it for on with as are was at by an be this "
    "from or which you not have has had but they his her its were been"
).split()


def tokens(col) -> Column:
    return F.regexp_extract_all(col, F.lit(TOKEN_REGEX), 0)


def shingles(tok: Column, width: int = 5) -> Column:
    """w-gram shingle strings; short docs → one whole-sequence shingle."""
    n = F.size(tok)
    full = F.transform(
        F.sequence(F.lit(0), n - width),
        lambda i: F.concat_ws(" ", F.slice(tok, i + 1, width)),
    )
    return (
        F.when(n >= width, full)
        .when(n > 0, F.array(F.concat_ws(" ", tok)))
        .otherwise(F.array().cast("array<string>"))
    )


def _shingle_hash_arrays(docs: DataFrame, id_col: str, text_col: str, width: int) -> DataFrame:
    """(id, sorted array of distinct-shingle hashes) — one row per doc.

    Keeping the shingles in array form (instead of exploding immediately)
    lets prefix extraction run as a per-row ``slice`` inside the scan stage;
    hashing shrinks every downstream shuffle to (id, int64) rows.

    The tokenize+shingle+hash projection is the expensive part of the
    whole operator, so a narrow scan (one small parquet file = one
    partition) must be fanned out first or it runs single-task
    (guide §2.5); no-op whenever the scan already plans enough splits.
    """
    from ..plans.parallel import fan_out_small_scan

    docs = fan_out_small_scan(docs.select(F.col(id_col), F.col(text_col)))
    return docs.select(
        F.col(id_col).alias("__id"),
        F.array_sort(
            F.array_distinct(
                F.transform(
                    F.array_distinct(shingles(tokens(F.col(text_col)), width)),
                    lambda s: F.xxhash64(s),
                )
            )
        ).alias("__hs"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 5,
    threshold: float = 0.8,
    prefix_filter: bool = True,
) -> DataFrame:
    """Exact token-w-gram Jaccard dedup: all pairs with J >= threshold.

    EXACT (no LSH, no false negatives) — the verification counterpart of
    the sketch pipeline and the DuckDB-oracle-matched operator. The
    default plan uses classic prefix filtering (Chaudhuri/Bayardo): under
    a global order (the shingle hash), two sets with J >= t must share an
    element within their floor((1-t)|A|)+1 smallest elements — proof: the
    smallest common element x of A∩B has rank <= |A\\B|+1 <= (1-t)|A|+1 in
    A, likewise in B. So the self-join runs on ~(1-t) of the shingles, a
    length filter (t*na <= nb <= na/t) prunes further, and the full
    intersection is computed only for surviving candidate pairs — as a
    per-pair JVM ``array_intersect`` over the two sorted hash-set arrays.
    ``prefix_filter=False`` keeps the exhaustive self-join (the small-scale
    cross-check path).

    The prefix length is computed integer-exactly as ``n - ceil(t*n) + 1``
    (== floor((1-t)n) + 1) with a 1e-9 guard inside the ceil so float error
    can only ENLARGE the prefix: the naive ``floor((1-t)*n)`` form loses one
    element whenever (1-t)*n is an exact integer (1-0.8 = 0.19999... in
    binary), silently dropping pairs at J == threshold. Prefix extraction is
    a per-row JVM ``slice`` over the doc's sorted hash array — map-side, in
    the same stage as the scan; no window, no extra exchange.
    """
    # the per-doc hash arrays feed several consumers: cut lineage so
    # tokenization+shingling runs once
    arr = _shingle_hash_arrays(docs, id_col, text_col, width).localCheckpoint(eager=False)
    sizes = arr.select("__id", F.size("__hs").alias("n"))

    if prefix_filter:
        plen = (
            F.col("n")
            - F.ceil(F.lit(threshold) * F.col("n") - F.lit(1e-9))
            + F.lit(1)
        ).cast("int")
        pref = (
            arr.withColumn("n", F.size("__hs"))
            .select("__id", "n", F.explode(F.slice("__hs", F.lit(1), plen)).alias("__shh"))
        )
        a, b = pref.alias("a"), pref.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.__shh") == F.col("b.__shh"))
                & (F.col("a.__id") < F.col("b.__id"))
                & (F.col("b.n") >= F.lit(threshold) * F.col("a.n"))
                & (F.col("a.n") >= F.lit(threshold) * F.col("b.n")),
            )
            .select(F.col("a.__id").alias("ia"), F.col("b.__id").alias("ib"))
            .distinct()
        )
        # candidates are a tiny fraction of the corpus after prefix+length
        # filtering, so the full intersection is cheapest as a per-pair JVM
        # array_intersect over the two sorted hash-set arrays — no explode
        # of the whole corpus, no count groupBy, no sizes joins
        ha = arr.select(F.col("__id").alias("ia"), F.col("__hs").alias("__ha"))
        hb = arr.select(F.col("__id").alias("ib"), F.col("__hs").alias("__hb"))
        scored = (
            cand.join(ha, "ia")
            .join(hb, "ib")
            .select(
                "ia",
                "ib",
                F.size("__ha").alias("na"),
                F.size("__hb").alias("nb"),
                F.size(F.array_intersect("__ha", "__hb")).alias("inter"),
            )
        )
        return scored.select(
            F.col("ia").alias(f"{id_col}_a"),
            F.col("ib").alias(f"{id_col}_b"),
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ).alias("jaccard"),
        ).where(F.col("jaccard") >= threshold)
    else:
        ex = arr.select("__id", F.explode("__hs").alias("__shh"))
        a, b = ex.alias("a"), ex.alias("b")
        inter = (
            a.join(
                b,
                (F.col("a.__shh") == F.col("b.__shh"))
                & (F.col("a.__id") < F.col("b.__id")),
            )
            .groupBy(F.col("a.__id").alias("ia"), F.col("b.__id").alias("ib"))
            .agg(F.count("*").alias("inter"))
        )
    return (
        inter.join(sizes.withColumnRenamed("__id", "ia").withColumnRenamed("n", "na"), "ia")
        .join(sizes.withColumnRenamed("__id", "ib").withColumnRenamed("n", "nb"), "ib")
        .select(
            F.col("ia").alias(f"{id_col}_a"),
            F.col("ib").alias(f"{id_col}_b"),
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def exact_dedup_map(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Every doc mapped to the min-id representative of identical text.

    Partitions the window by sha2(text) projected *before* the exchange, so
    the shuffle carries (id, 32-byte digest) rows — never the document
    content itself. Identical output to windowing over raw text.
    """
    d = docs.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("__sha"))
    w = Window.partitionBy("__sha")
    return d.select(F.col(id_col), F.min(id_col).over(w).alias("rep_id"))


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc token counting: total, distinct, chars."""
    tok = tokens(F.col(text_col))
    return docs.select(
        F.col(id_col),
        F.size(tok).alias("n_tokens"),
        F.size(F.array_distinct(tok)).alias("n_distinct_tokens"),
        F.length(text_col).alias("n_chars"),
    )


def quality_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Quality-scoring features: alpha ratio, stopword ratio, token length."""
    tok = tokens(F.col(text_col))
    stop_arr = F.array([F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.filter(tok, lambda t: F.array_contains(stop_arr, F.lower(t))))
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", ""))
    token_chars = F.aggregate(tok, F.lit(0), lambda acc, t: acc + F.length(t))
    return docs.select(
        F.col(id_col),
        F.round(alpha_chars / F.greatest(F.length(text_col), F.lit(1)), 6).alias("alpha_ratio"),
        F.round(n_stop / F.greatest(F.size(tok), F.lit(1)), 6).alias("stopword_ratio"),
        F.round(token_chars / F.greatest(F.size(tok), F.lit(1)), 6).alias("avg_token_len"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-ratio language heuristic: 'en' vs 'unk'."""
    tok = tokens(F.col(text_col))
    stop_arr = F.array([F.lit(w) for w in EN_STOPWORDS])
    ratio = F.size(F.filter(tok, lambda t: F.array_contains(stop_arr, F.lower(t)))) / F.greatest(
        F.size(tok), F.lit(1)
    )
    return docs.select(
        F.col(id_col),
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("unk")).alias("lang_pred"),
    )


def frequent_tokens(
    docs: DataFrame, text_col: str = "text", min_ratio: float = 0.002
) -> DataFrame:
    """Heavy-hitter tokens: count >= min_ratio * total tokens.

    Exact mode of the Misra-Gries contract (frequencies/sketch.rs:394-430,
    NoFalsePositives at threshold): deterministic set output (no top-k tie
    ambiguity).
    """
    ex = docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
    counts = ex.groupBy("token").agg(F.count("*").alias("cnt"))
    total = ex.agg(F.count("*").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("cnt") >= F.col("__total") * min_ratio)
        .drop("__total")
    )
