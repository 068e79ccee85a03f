"""DSIR-style importance weighting: score every raw document by how
much its hashed n-gram feature distribution looks like a target corpus
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" — the public recipe behind quality-matched pretraining
subsets).

Features are word unigrams + bigrams hashed into ``n_buckets`` buckets;
the weight of a document is the sum over its feature occurrences of
``log P_target(bucket) - log P_raw(bucket)`` under add-k-smoothed bucket
unigram models.  Selection (top-k or Gumbel resampling) is the caller's
choice downstream — the weight column is the deliverable.

The bucket hash is the md5→hex→int construction shared with
``textstats.fingerprint`` / ``stratified_sample``, so the driver's
DuckDB oracle reproduces weights value-for-value.

Scale: both bucket models are ``n_buckets``-row aggregations (map-side
partial combine, one tiny shuffle each); the per-document scoring joins
the exploded features against the broadcast ``n_buckets``-row ratio
table and reduces with one groupBy(id).  Document text never shuffles —
only (id, bucket) pairs do — and everything is JVM column expressions
inside whole-stage codegen (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _feature_stream(
    df: DataFrame, id_cols: list, n_buckets: int, salt: str, text_col: str
) -> DataFrame:
    """Exploded word unigram+bigram feature stream, each gram hashed to
    [0, n_buckets) via the first 8 hex chars of md5 — portable SQL.

    The gram strings and their md5 buckets are built AFTER the explode,
    inside whole-stage codegen.  The previous per-row spelling built
    bigrams with a transform-lambda that closed over ``words`` and
    re-evaluated the split per ELEMENT — O(words²) tokenization — and
    hashed every gram through an interpreted md5 lambda: together the
    dominant cost of the operator (dsir weights measured 89 → ~2 s at
    the sf1 rung).  Identical feature multiset: bigram text is the same
    "w_i w_{i+1}" string, unigrams are the words themselves."""
    words = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda w: w != F.lit("")
    )
    ids = [F.col(c) for c in id_cols]
    uni = df.select(*ids, F.explode(words).alias("__g"))
    cnt = F.greatest(F.size(words) - F.lit(1), F.lit(0))
    bi = df.select(
        *ids,
        F.explode(
            F.arrays_zip(
                F.slice(words, 1, cnt).alias("w0"),
                F.slice(words, 2, cnt).alias("w1"),
            )
        ).alias("__p"),
    ).select(*ids, F.concat_ws(" ", F.col("__p.w0"), F.col("__p.w1")).alias("__g"))
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(salt), F.col("__g"))), 1, 8),
            16,
            10,
        ).cast("long")
        % F.lit(n_buckets)
    )
    return uni.unionByName(bi).select(*ids, bucket.alias("bucket"))


def hashed_ngram_counts(
    df: DataFrame,
    n_buckets: int = 256,
    salt: str = "dsir1",
    text_col: str = "text",
) -> DataFrame:
    """Bucket unigram counts of the corpus's hashed word 1+2-gram
    features: (bucket, c) with at most ``n_buckets`` rows."""
    from prometheus_spark.pipeline.dedup import _spread

    return (
        _feature_stream(_spread(df, text_col), [], n_buckets, salt, text_col)
        .groupBy("bucket")
        .agg(F.count("*").alias("c"))
    )


def dsir_weights(
    raw_df: DataFrame,
    target_df: DataFrame,
    n_buckets: int = 256,
    k: float = 0.5,
    salt: str = "dsir1",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document importance weight of every ``raw_df`` document
    toward ``target_df``'s feature distribution.

    weight(d) = Σ_{g ∈ feats(d)} [log P̂_t(bucket(g)) − log P̂_r(bucket(g))]

    with P̂(b) = (C(b)+k) / (N + k·n_buckets) estimated from the target
    and raw corpora respectively.  Returns (id, n_feats, weight) — one
    row per raw document, weight rounded to 6 decimals, feature-less
    documents at weight 0.  Rank/threshold on ``weight`` to select the
    DSIR subset.
    """
    tgt = hashed_ngram_counts(target_df, n_buckets, salt, text_col).select(
        F.col("bucket"), F.col("c").alias("ct")
    )
    raw = hashed_ngram_counts(raw_df, n_buckets, salt, text_col).select(
        F.col("bucket"), F.col("c").alias("cr")
    )
    totals = tgt.agg(F.sum("ct").alias("nt")).join(
        raw.agg(F.sum("cr").alias("nr"))
    )
    # ≤ n_buckets rows: the full smoothed log-ratio table
    ratios = (
        tgt.join(raw, "bucket", "full")
        .join(totals)
        .select(
            "bucket",
            (
                F.log((F.coalesce("ct", F.lit(0)) + F.lit(k)) / (F.col("nt") + F.lit(k * n_buckets)))
                - F.log((F.coalesce("cr", F.lit(0)) + F.lit(k)) / (F.col("nr") + F.lit(k * n_buckets)))
            ).alias("lr"),
        )
    )
    from prometheus_spark.pipeline.dedup import _spread

    feats = _feature_stream(
        _spread(raw_df, id_col), [id_col], n_buckets, salt, text_col
    )
    # every document bucket appears in the raw model by construction, so
    # an inner broadcast join loses nothing
    scored = (
        feats.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.round(F.sum("lr"), 6).alias("weight"),
        )
    )
    return (
        raw_df.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("weight", F.lit(0.0)).alias("weight"),
        )
    )
