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
