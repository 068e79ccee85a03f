"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.  All pure column expressions (codegen'd); no UDFs.

Every operator here is deliberately expressible in portable SQL too, so
the DuckDB oracle can verify it value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A BPE-ish word/punctuation tokenizer: word pieces OR single non-space
# punctuation — mirrors common pretokenizers closely enough for counting.
TOKEN_PATTERN = "[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"

# tiny per-language stopword anchors (public common words)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "de", "que", "los", "las"],
    "zh": ["的", "是", "了", "在", "我"],
}


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens per document."""
    ws = F.size(F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != F.lit("")))
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_PATTERN), 0))
    return df.select(
        F.col(id_col),
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic document quality in [0,1]: length band, punctuation
    ratio, stopword hit-rate, mean word length band — the standard
    pretraining-filter features."""
    text = F.col(text_col)
    n_chars = F.length(text).cast("double")
    words = F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(words).cast("double")
    n_punct = F.size(F.regexp_extract_all(text, F.lit("[^A-Za-z0-9_\\s]"), 0)).cast("double")
    mean_word_len = F.when(n_words > 0, (n_chars - (n_words - 1)) / n_words).otherwise(0.0)

    en_stop = LANG_STOPWORDS["en"]
    stop_hits = F.size(
        F.filter(words, lambda w: w.isin(en_stop))
    ).cast("double")
    stop_ratio = F.when(n_words > 0, stop_hits / n_words).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)

    len_score = F.when((n_words >= 5) & (n_words <= 100000), 1.0).otherwise(0.0)
    word_len_score = F.when((mean_word_len >= 2.0) & (mean_word_len <= 12.0), 1.0).otherwise(0.0)
    punct_score = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.0)
    stop_score = F.least(stop_ratio * 5.0, F.lit(1.0))

    score = (len_score + word_len_score + punct_score + stop_score) / 4.0
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-anchor language ID across a fixed language set: score =
    fraction of words hitting each language's anchor list; argmax with a
    deterministic tie-break on language code."""
    from prometheus_spark.pipeline.dedup import _spread

    # the 5-language interpreted filter/argmax chain is the heaviest
    # map-only pass in textstats — parallelize single-file bench scans
    # (a no-op at corpus scale where inputs have many splits)
    df = _spread(df, id_col)
    words = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda w: w != F.lit("")
    )
    scores = []
    for lang in sorted(LANG_STOPWORDS):
        hits = F.size(F.filter(words, lambda w: w.isin(LANG_STOPWORDS[lang])))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # argmax: max by (hits, lang) with lang DESC tie-break made
    # deterministic by negating preference: pick max hits, then smallest
    # lang code — encode as struct(hits, reversed lang) and take max
    best = F.reverse(F.array_sort(F.array(*scores)))[0]
    # array_sort on struct sorts by hits asc then lang asc; reverse → hits
    # desc, lang desc.  To break ties by *smallest* lang, re-sort equal
    # scores explicitly:
    max_hits = best["hits"]
    winner = F.array_min(
        F.filter(F.array(*scores), lambda s: s["hits"] == max_hits)
    )["lang"]
    return df.select(
        F.col(id_col),
        F.when(max_hits > 0, winner).otherwise(F.lit("unknown")).alias("pred_lang"),
        max_hits.cast("long").alias("anchor_hits"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lowercased text (md5 exists in both Spark and
    DuckDB, so the oracle can verify value-for-value)."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(F.col(id_col), F.md5(normalized).alias("fingerprint"))


def repetition_ratio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repetition features per document (the Gopher-style repetition
    filters): fraction of duplicate words and fraction of duplicate
    bigrams.  Pure column expressions — array ops stay in codegen; at
    100 TB this is a map-only pass, no shuffle.
    """
    from prometheus_spark.pipeline.dedup import _spread

    # two array_distinct passes per document — parallelize single-file
    # bench scans (a no-op at corpus scale)
    df = _spread(df, id_col)
    words = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda w: w != F.lit("")
    )
    n = F.size(words).cast("double")
    n_distinct = F.size(F.array_distinct(words)).cast("double")
    # bigrams via zip_with over shifted slices — O(words) per document.
    # (A transform-lambda that closes over ``words`` re-evaluates the
    # split per ELEMENT — no common-subexpression elimination across
    # lambda scopes — turning tokenization O(words²) per doc.)
    bigrams = _ngrams_all(words, 2)
    nb = F.size(bigrams).cast("double")
    nb_distinct = F.size(F.array_distinct(bigrams)).cast("double")
    dup_word = F.when(n > 0, 1.0 - n_distinct / n).otherwise(0.0)
    dup_bigram = F.when(nb > 0, 1.0 - nb_distinct / nb).otherwise(0.0)
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        F.round(dup_word, 6).alias("dup_word_frac"),
        F.round(dup_bigram, 6).alias("dup_bigram_frac"),
    )


def _ngrams_all(words, n: int):
    """All word n-grams (duplicates kept), as zip_with over shifted
    slices — elementwise array ops, O(words) per document (same shape as
    dedup._word_ngrams, which is the distinct variant)."""
    count = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0))
    grams = F.slice(words, 1, count)
    for j in range(1, n):
        grams = F.zip_with(
            grams, F.slice(words, j + 1, count),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return grams


def topk_ngrams(
    df: DataFrame,
    k: int = 20,
    n: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide top-k word n-grams with counts.  The explode →
    groupBy(count) benefits from map-side partial aggregation, and the
    final top-k is a TakeOrderedAndProject (no global sort) — the plan
    holds at 100 TB because only per-partition top candidates reach the
    driver-side limit stage.  Tie-break: count desc, gram asc.

    Tokenization is materialized ONCE per row and grams are built by
    zip_with over shifted slices (O(words) per doc); the previous
    transform-lambda closed over the split and re-evaluated it per
    element — O(words²) — which cost 25× at the sf10 scale rung.

    The aggregation key is the STRUCT of the n token refs, not the
    concatenated gram string: building one string per gram allocated
    ~100M strings per sf10 pass just to hash them (2.16 s → 1.19 s
    measured).  The gram string is materialized only for the k result
    rows.  Equivalent grouping: tokens cannot contain whitespace (they
    come from split on \\s+), so gram ↔ token-tuple is a bijection; the
    tie-break still sorts the concatenated STRING, so ordering is
    byte-identical to the string-keyed plan.
    """
    words = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda w: w != F.lit("")
    )
    from prometheus_spark.pipeline.dedup import _spread

    toks = _spread(df, text_col).select(words.alias("__w"))
    count = F.greatest(F.size(F.col("__w")) - F.lit(n - 1), F.lit(0))
    parts = [
        F.slice(F.col("__w"), j + 1, count).alias(f"w{j}") for j in range(n)
    ]
    gram_str = F.concat_ws(" ", *[F.col(f"p.w{j}") for j in range(n)])
    return (
        toks.select(F.explode(F.arrays_zip(*parts)).alias("p"))
        .groupBy("p")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(gram_str))
        .limit(k)
        .select(gram_str.alias("gram"), F.col("cnt"))
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic per-stratum sampling — the downsampling step of a
    pretraining data mix (e.g. keep 10% of en, 50% of fr).  The keep
    decision is a pure hash of (salt, id): reproducible across runs and
    engines (md5 is portable SQL), embarrassingly parallel, no shuffle.
    """
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 10_000
    )
    rate = None
    for stratum, r in sorted(rates.items()):
        cond = F.col(stratum_col) == stratum
        rate = (
            F.when(cond, F.lit(int(r * 10_000)))
            if rate is None
            else rate.when(cond, F.lit(int(r * 10_000)))
        )
    rate = (
        rate.otherwise(F.lit(int(default_rate * 10_000)))
        if rate is not None
        else F.lit(int(default_rate * 10_000))
    )
    return df.filter(bucket < rate)
