"""Subword tokenization for training-data pipelines: a frequency-built
piece vocabulary and greedy longest-match-first (WordPiece-style)
segmentation.

The segmentation loop is irreducibly sequential per word, so it is the
one pipeline operator implemented as a Python UDF — but Arrow-batched
and applied to the corpus's DISTINCT WORDS only, never to the corpus:
tokenizing 100 TB costs O(|distinct words|) Python work plus one
JVM-side join back to the exploded tokens.  Everything around the loop
(vocab counts, explode, reassembly) is column expressions.

Determinism: vocab selection breaks count ties lexicographically and
the greedy match is a pure function of (word, vocab), so the operator
is reproducible across engines — the DuckDB oracle re-derives the same
segmentation with a recursive CTE.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNK = "<unk>"


def _words(text_col: str):
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda w: w != F.lit("")
    )


def build_subword_vocab(
    df: DataFrame,
    top_words: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """Piece vocabulary = every single character in the corpus plus the
    ``top_words`` most frequent whole words (ties broken by piece text
    ascending) — the degenerate-but-deterministic end of the WordPiece
    frequency-merge family, adequate for coverage-complete greedy
    segmentation (single chars guarantee no <unk> on seen text).

    Returns (piece) — one row per vocabulary entry.

    Scale: two explode+count aggregations with map-side combine; the
    result is vocabulary-sized (tiny), made to be collected/broadcast.
    """
    from prometheus_spark.pipeline.dedup import _spread

    # single-file bench inputs otherwise serialize the whole
    # explode+count pipeline into one scan task (no-op at corpus scale)
    toks = _spread(df, text_col).select(F.explode(_words(text_col)).alias("w"))
    chars = toks.select(
        F.explode(F.regexp_extract_all(F.col("w"), F.lit("."), 0)).alias("piece")
    ).distinct()
    words = (
        toks.groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(top_words)
        .select(F.col("w").alias("piece"))
    )
    return chars.unionByName(words).distinct()


def greedy_segment(word: str, vocab: frozenset, max_len: int) -> list[str]:
    """Greedy longest-match-first segmentation (pure function)."""
    pieces = []
    i, n = 0, len(word)
    while i < n:
        for ln in range(min(max_len, n - i), 0, -1):
            if word[i : i + ln] in vocab:
                pieces.append(word[i : i + ln])
                i += ln
                break
        else:
            pieces.append(UNK)
            i += 1
    return pieces


def wordpiece_tokenize(
    df: DataFrame,
    vocab: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment every document with greedy longest-match against
    ``vocab``.  Returns (id, n_words, n_pieces, pieces_text) where
    pieces_text is the space-joined segmentation of the whole document.

    Scale shape: the Python loop runs once per DISTINCT word (Arrow
    batches over a deduplicated word table), then a JVM join maps every
    token occurrence to its piece list — the corpus-sized side never
    enters Python.  The distinct-word table is Zipf-bounded (≪ corpus),
    and the segmentation map joins back either broadcast (typical) or
    hash-partitioned on the word key.
    """
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        StringType,
        StructField,
        StructType,
    )

    vset = frozenset(vocab)
    max_len = max((len(p) for p in vset), default=1)

    schema = StructType(
        [
            StructField("w", StringType()),
            StructField("pieces", ArrayType(StringType())),
        ]
    )

    def seg_batch(batches):
        for pdf in batches:
            ws = list(pdf["w"])
            yield pd.DataFrame(
                {
                    "w": ws,
                    "pieces": [greedy_segment(w, vset, max_len) for w in ws],
                }
            )

    from prometheus_spark.shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    from prometheus_spark.pipeline.dedup import _spread

    df = _spread(df, id_col)
    distinct_words = df.select(
        F.explode(_words(text_col)).alias("w")
    ).distinct()
    seg = distinct_words.mapInPandas(seg_batch, schema)

    toks = df.select(F.col(id_col), F.posexplode(_words(text_col)).alias("pos", "w"))
    joined = toks.join(seg, "w")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(F.size("pieces")).cast("long").alias("n_pieces"),
            F.array_join(
                F.flatten(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "pieces"))),
                        lambda s: s["pieces"],
                    )
                ),
                " ",
            ).alias("pieces_text"),
        )
    )


def subword_token_stats(
    df: DataFrame,
    top_words: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Convenience composition: build the vocabulary from the corpus
    itself, then tokenize the corpus with it (the self-trained shape a
    fertility/compression analysis uses: n_pieces / n_words measures
    how well the vocab fits the data).  The vocab is collected to the
    driver — it is vocabulary-sized by construction."""
    vocab = [r["piece"] for r in build_subword_vocab(df, top_words, text_col).collect()]
    return wordpiece_tokenize(df, vocab, text_col, id_col)
