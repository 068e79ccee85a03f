"""Count-based n-gram language-model scoring — the CCNet/KenLM-style
perplexity quality filter of LLM data pipelines, re-expressed as pure
DataFrame aggregations.

``bigram_lm_score`` trains an add-k-smoothed bigram LM over a reference
corpus (usually the corpus itself, or a held-out "clean" slice) and
scores every document with its average negative log2 probability per
bigram (bits/token); low bits = fluent under the reference distribution,
high bits = noise.  Real pipelines threshold or bucket on this score.

Everything is column expressions + two count aggregations — no UDFs, so
the DuckDB oracle verifies values end-to-end.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _words(text: Column) -> Column:
    return F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"), lambda w: w != F.lit("")
    )


def _bigrams(words: Column) -> Column:
    """(w1, w2) structs for consecutive word pairs — zip of the array
    with its shift, O(words) elementwise."""
    n = F.greatest(F.size(words) - 1, F.lit(0))
    return F.zip_with(
        F.slice(words, 1, n),
        F.slice(words, 2, n),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def bigram_counts(
    df: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(bigram counts, unigram-context counts, vocab size) over the
    corpus.  Counts shuffle as (gram, partial-count) pairs after
    map-side combine; document text never shuffles."""
    from prometheus_spark.pipeline.dedup import _spread

    # single-file bench inputs otherwise serialize the whole
    # explode+count pipeline into one scan task (no-op at corpus scale)
    df = _spread(df, text_col)
    words = _words(F.col(text_col))
    toks = df.select(F.explode(words).alias("w"))
    uni = toks.groupBy("w").agg(F.count("*").alias("c1"))
    bi = (
        df.select(F.explode(_bigrams(words)).alias("b"))
        .select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
    )
    vocab = toks.agg(F.countDistinct("w").alias("v"))
    return bi, uni, vocab


def bigram_lm_score(
    df: DataFrame,
    ref_df: Optional[DataFrame] = None,
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score each document's fluency under an add-k bigram LM trained on
    ``ref_df`` (defaults to ``df`` itself — self-scoring, which is how
    dedup-adjacent outlier filters are usually run).

    P(w2|w1) = (C(w1,w2) + k) / (C(w1) + k·V); the score is
    bits = −mean log2 P over the document's bigrams (so perplexity =
    2^bits).  Documents with < 2 tokens score 0 bits with n_bigrams = 0.

    Returns (id, n_bigrams, bits) with bits rounded to 6 decimals.

    Scale: the model is two count tables ~O(vocab + seen-bigrams) —
    orders of magnitude smaller than the corpus, so the scoring joins
    broadcast when they fit and otherwise shuffle on the gram key; the
    per-document reduce is one groupBy(id) with map-side partial sums.
    The V scalar rides a broadcast nested-loop join of a 1-row frame.
    """
    from prometheus_spark.pipeline.dedup import _spread

    bi, uni, vocab = bigram_counts(ref_df if ref_df is not None else df, text_col)
    df = _spread(df, id_col)
    words = _words(F.col(text_col))
    doc_bi = df.select(
        F.col(id_col), F.explode(_bigrams(words)).alias("b")
    ).select(
        F.col(id_col), F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    )
    scored = (
        doc_bi.join(bi, ["w1", "w2"], "left")
        .join(uni, doc_bi["w1"] == uni["w"], "left")
        .join(F.broadcast(vocab))
        .select(
            F.col(id_col),
            (
                -F.log2(
                    (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(float(k)))
                    / (
                        F.coalesce(F.col("c1"), F.lit(0))
                        + F.lit(float(k)) * F.col("v")
                    )
                )
            ).alias("__bits"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(F.avg("__bits"), 6).alias("bits"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("bits", F.lit(0.0)).alias("bits"),
        )
    )
