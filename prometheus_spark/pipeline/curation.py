"""Corpus-curation operators for training-data pipelines: PII redaction,
document chunking, GPT-style sequence packing, and boilerplate (shared
line) removal.

Like textstats, every operator is a pure column-expression plan (no
Python UDFs) restricted to the regex/array subset that both Spark's Java
regex engine and DuckDB's RE2 implement identically, so the driver's
DuckDB oracle verifies each one value-for-value.

Scale notes are per-operator; the common theme is that the hot path is
map-only (redaction, chunking) or a single keyed shuffle whose key the
user controls (packing shards, boilerplate lines).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# --- PII redaction -----------------------------------------------------
#
# Patterns stay inside the Java-regex ∩ RE2 common subset: character
# classes, bounded repetition, non-capturing groups, \b word boundaries.
# No lookaround (RE2 has none), no backreferences.
PII_PATTERNS: list[tuple[str, str, str]] = [
    # (name, pattern, replacement) — applied IN ORDER; replacements
    # contain no digits or '@', so later patterns never re-match them
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    # generic international-ish phone: 8+ digits allowing separators;
    # runs AFTER ssn/ipv4 so their digit runs are already tokenized out
    ("phone", r"\+?[0-9][0-9() \-]{6,}[0-9]", "<PHONE>"),
]


def pii_redact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails, IPv4s, SSNs, and phone numbers, in that order.

    Returns (id, redacted, n_email, n_ipv4, n_ssn, n_phone) where each
    count is the number of matches at its stage (i.e. counted against
    the text AFTER the earlier replacements, mirroring the replacement
    cascade exactly).

    Scale: map-only — four regexp_count + four regexp_replace per row,
    all whole-stage codegen; no shuffle, no UDF.  At 100 TB this is a
    pure scan-transform-write pass.
    """
    from prometheus_spark.pipeline.dedup import _spread

    df = _spread(df, id_col)  # parallelize single-file bench scans
    stage = F.col(text_col)
    counts = []
    for name, pattern, repl in PII_PATTERNS:
        counts.append(
            F.regexp_count(stage, F.lit(pattern)).cast("long").alias(f"n_{name}")
        )
        stage = F.regexp_replace(stage, pattern, repl)
    return df.select(
        F.col(id_col), stage.alias("redacted"), *counts
    )


# --- document chunking -------------------------------------------------


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 64,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into whitespace-token windows of
    ``max_tokens`` tokens advancing by ``max_tokens - overlap`` — the
    RAG/embedding-prep chunker.  Returns (id, chunk_id, n_tokens,
    chunk_text); empty documents produce no chunks.

    Scale: map-only explode — tokens never leave the row until the final
    per-chunk projection, so the fan-out is bounded by document length /
    stride.  No shuffle.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("require 0 <= overlap < max_tokens")
    from prometheus_spark.pipeline.dedup import _spread

    df = _spread(df, id_col)  # parallelize single-file bench scans
    stride = max_tokens - overlap
    words = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != F.lit("")
    )
    n = F.size(words)
    # chunk start offsets 0, stride, 2*stride, ... below n
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)),
        lambda s: s < n,
    )
    out = df.select(
        F.col(id_col), words.alias("__w"),
        F.posexplode(starts).alias("chunk_id", "__start"),
    )
    piece = F.slice(F.col("__w"), F.col("__start") + 1, max_tokens)
    return out.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


# --- GPT-style sequence packing ---------------------------------------


def pack_sequences(
    df: DataFrame,
    seq_len: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: Optional[str] = None,
) -> DataFrame:
    """Concatenation packing: documents are laid end-to-end in ``id``
    order and cut into fixed ``seq_len``-token training sequences
    (documents may straddle a boundary — the standard GPT-style packing,
    where an EOS token separates documents and nothing is padded).

    Returns (id, n_tokens, offset, first_seq, last_seq): the document's
    token offset in the concatenated stream and the first/last sequence
    indices it lands in.  Zero-token documents take no space (last_seq =
    first_seq, degenerate).

    Scale: the running offset is a prefix sum — a window over
    ``shard_col`` partitions.  Pass a shard column at scale (stream
    packing is per-shard anyway in real pipelines); ``None`` means one
    global stream, which Spark executes on a single partition — fine for
    notebooks, wrong for 100 TB, and documented as such.
    """
    token_count = F.size(
        F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != F.lit(""))
    ).cast("long")
    # +1 for the EOS separator each document contributes
    occupied = token_count + 1
    if shard_col is None:
        w = Window.orderBy(id_col)
    else:
        w = Window.partitionBy(shard_col).orderBy(id_col)
    offset = F.coalesce(
        F.sum(F.col("__occ")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    base = df.select(
        *( [F.col(shard_col)] if shard_col else [] ),
        F.col(id_col),
        token_count.alias("n_tokens"),
        occupied.alias("__occ"),
    )
    out = base.select(
        *( [F.col(shard_col)] if shard_col else [] ),
        F.col(id_col),
        F.col("n_tokens"),
        offset.alias("offset"),
    )
    first_seq = F.floor(F.col("offset") / seq_len)
    last_seq = F.floor(
        (F.col("offset") + F.greatest(F.col("n_tokens") - 1, F.lit(0))) / seq_len
    )
    return out.select(
        *( [F.col(shard_col)] if shard_col else [] ),
        F.col(id_col),
        F.col("n_tokens"),
        F.col("offset"),
        first_seq.cast("long").alias("first_seq"),
        last_seq.cast("long").alias("last_seq"),
    )


# --- boilerplate (shared-line) removal ---------------------------------


def boilerplate_lines(
    df: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Lines (newline-split, trimmed, non-empty) that occur in at least
    ``min_docs`` DISTINCT documents — nav bars, cookie banners, license
    headers.  Returns (line, n_docs) ordered nowhere (caller sorts).

    Scale: explode → distinct per doc → count-distinct groupBy.  Only
    (line, id) pairs shuffle, never document bodies; partial aggregation
    collapses per-partition repeats before the exchange.
    """
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda s: F.trim(s)),
        lambda s: s != F.lit(""),
    )
    return (
        df.select(F.col(id_col), F.explode(F.array_distinct(lines)).alias("line"))
        .groupBy("line")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate(
    df: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Strip boilerplate lines (per :func:`boilerplate_lines`) from every
    document.  Returns (id, clean_text, n_removed) with surviving lines
    re-joined by '\\n' in original order; a document that was ALL
    boilerplate comes back with empty clean_text.

    Scale: docs posexplode to (id, pos, line); the boilerplate set is
    usually tiny relative to the corpus, so the anti-join broadcasts
    under AQE; re-assembly groups by id — one shuffle keyed on the
    document id, carrying only surviving lines.
    """
    bp = boilerplate_lines(df, min_docs, text_col, id_col).select(
        F.col("line").alias("__bp_line")
    )
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda s: F.trim(s)),
        lambda s: s != F.lit(""),
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(lines).alias("pos", "line")
    )
    kept = exploded.join(
        bp, exploded["line"] == bp["__bp_line"], "left_anti"
    )
    n_lines = df.select(
        F.col(id_col), F.size(lines).cast("long").alias("__n_lines")
    )
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("clean_text"),
            F.count("*").alias("__n_kept"),
        )
    )
    return (
        n_lines.join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            (F.col("__n_lines") - F.coalesce("__n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


# --- repeated-span (exact substring) removal ---------------------------


def repeated_spans(
    df: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Word ``n``-token spans whose md5 occurs in at least ``min_docs``
    DISTINCT documents — the candidate set of the exact-substring dedup
    of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better"), with fixed-length token windows standing in for
    suffix-array substrings (the standard scalable approximation).

    Returns (span_hash, n_docs).  Only (hash, id) pairs shuffle.
    """
    # Per-doc-distinct spans as STRUCTS of the n token refs (arrays_zip
    # of shifted slices); the span string and its md5 are built AFTER
    # the explode, inside whole-stage codegen.  The previous spelling
    # folded zip_with(concat_ws) chains and an md5-per-gram transform —
    # all interpreted HOF lambdas, the dominant corpus-scale cost of the
    # repeated-span family (remove_repeated_spans measured 31 → ~3 s at
    # the sf1 rung from this + the matching token-side reshape).
    # Identical output: tokens are \s+-split so span text ↔ token tuple
    # is a bijection, and md5(concat_ws(' ', tuple)) IS the span-string
    # md5 the function has always emitted.
    from prometheus_spark.pipeline.dedup import _spread

    spans = _span_structs(F.col(text_col), n)
    return (
        _spread(df, id_col)
        .select(F.col(id_col), F.explode(F.array_distinct(spans)).alias("__p"))
        .select(
            F.col(id_col),
            F.md5(
                F.concat_ws(" ", *[F.col(f"__p.w{j}") for j in range(n)])
            ).alias("span_hash"),
        )
        .groupBy("span_hash")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def _span_words(text: Column) -> Column:
    return F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"), lambda w: w != F.lit("")
    )


def _span_structs(text: Column, n: int) -> Column:
    """array<struct<w0..w{n-1}>> of all n-token spans (one per start
    position; empty for docs shorter than n tokens)."""
    words = _span_words(text)
    count = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0))
    return F.arrays_zip(
        *[F.slice(words, j + 1, count).alias(f"w{j}") for j in range(n)]
    )


def remove_repeated_spans(
    df: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cut cross-document repeated spans OUT of each document: a token is
    dropped iff it is covered by some ``n``-token span (starting at any
    of the ``n`` positions ending at it) that appears in >= ``min_docs``
    distinct documents.  Surviving tokens re-join in order.

    Returns (id, clean_text, n_removed).

    Scale: tokens explode to (id, pos, token, span-start hash); the
    duplicated-span set is small relative to the corpus so its join
    broadcasts under AQE; coverage is a per-document window max over the
    previous ``n-1`` rows (dense positions, so a rows-frame — no range
    join); re-assembly is one groupBy(id) shuffle of surviving tokens.
    """
    # Span identity on BOTH sides is xxhash64 over the n token refs,
    # computed after the explode (whole-stage codegen) — md5 span
    # strings only exist in :func:`repeated_spans`' public output, they
    # were never needed to MATCH spans (equal spans ⇒ equal tuples ⇒
    # equal hashes; 2^-64 collisions are the same accepted trade as the
    # gram-hash dedup operators).  The interpreted zip_with(concat_ws)
    # chain + md5-per-gram transform this replaces was the dominant cost
    # of the operator (31 → ~3 s at the sf1 rung, with _spread
    # parallelizing the single-file bench scan exactly as in dedup.py —
    # a no-op at real corpus scale where inputs have many splits).
    from prometheus_spark.pipeline.dedup import _spread

    df = _spread(df, id_col)
    spans = _span_structs(F.col(text_col), n)
    dup = (
        df.select(F.col(id_col), F.explode(F.array_distinct(spans)).alias("__p"))
        .select(
            F.col(id_col),
            F.xxhash64(*[F.col(f"__p.w{j}") for j in range(n)]).alias("__h"),
        )
        .groupBy("__h")
        .agg(F.count("*").alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select(F.col("__h").alias("__dup_hash"))
    )
    words = _span_words(F.col(text_col))
    cnt = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0))
    # one struct per TOKEN position: the token itself plus the n-1
    # successors (arrays_zip pads the shifted slices with NULLs at the
    # tail); the span-start hash is NULL for the last n-1 positions,
    # where no span starts
    zipped = F.arrays_zip(
        words.alias("w0"),
        *[F.slice(words, j + 1, cnt).alias(f"w{j}") for j in range(1, n)],
    )
    toks = (
        df.select(F.col(id_col), cnt.alias("__cnt"), zipped.alias("__z"))
        .select(
            F.col(id_col),
            F.col("__cnt"),
            F.posexplode("__z").alias("pos", "__p"),
        )
        .select(
            F.col(id_col),
            F.col("pos"),
            F.col("__p.w0").alias("w"),
            F.when(
                F.col("pos") < F.col("__cnt"),
                F.xxhash64(*[F.col(f"__p.w{j}") for j in range(n)]),
            ).alias("h"),
        )
    )
    flagged = toks.join(dup, toks["h"] == dup["__dup_hash"], "left").select(
        F.col(id_col),
        "pos",
        "w",
        F.when(F.col("__dup_hash").isNotNull(), 1).otherwise(0).alias("__start"),
    )
    w_cov = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    covered = flagged.select(
        F.col(id_col), "pos", "w", F.max("__start").over(w_cov).alias("__cov")
    )
    kept = covered.filter(F.col("__cov") == 0)
    n_tokens = df.select(
        F.col(id_col), F.size(words).cast("long").alias("__n_tok")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))), lambda s: s["w"]
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("__n_kept"),
    )
    return n_tokens.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        (F.col("__n_tok") - F.coalesce("__n_kept", F.lit(0)))
        .cast("long")
        .alias("n_removed"),
    )


# --- temperature-weighted source mixing --------------------------------


def source_mix_rates(
    df: DataFrame, alpha: float = 0.7, source_col: str = "source"
) -> DataFrame:
    """Per-source keep rates for temperature sampling: sampling
    probability proportional to count^alpha (alpha < 1 flattens the
    source distribution — the multilingual/multi-source rebalancing of
    GPT-3/PaLM-style mixes).  Realized as a per-document keep rate
    (count/min_count)^(alpha-1), so the smallest source keeps rate 1.0
    and larger sources are downsampled toward the tempered mix.

    Returns (source, n_docs, rate).
    """
    counts = df.groupBy(source_col).agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy()
    return counts.select(
        F.col(source_col),
        F.col("n_docs"),
        F.round(
            F.pow(
                F.col("n_docs") / F.min("n_docs").over(w), F.lit(alpha - 1.0)
            ),
            6,
        ).alias("rate"),
    )


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.7,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "v1",
) -> DataFrame:
    """Deterministic temperature-weighted source mix: keep each document
    iff md5(salt:id) mod 1e6 < rate(source)·1e6 (rates from
    :func:`source_mix_rates`).  Pure hash decision — reproducible across
    engines and runs, no RNG state.

    Scale: the rate table is |sources| rows (broadcast); the keep filter
    is map-only.  No shuffle of document bodies anywhere.
    """
    counts = df.groupBy(source_col).agg(F.count("*").alias("__n"))
    w = Window.partitionBy()
    rates = counts.select(
        F.col(source_col),
        F.pow(F.col("__n") / F.min("__n").over(w), F.lit(alpha - 1.0)).alias(
            "__rate"
        ),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1_000_000
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(bucket < F.col("__rate") * 1_000_000)
        .drop("__rate")
    )


# --- C4-style heuristic line cleaning ---------------------------------
#
# The rule set follows the public C4 recipe (Raffel et al. 2020, §2.2):
# keep only lines that end in terminal punctuation, have enough words,
# and mention no blocklisted phrase; then drop whole documents that
# retain too few lines.  Rules stay in the Spark-regex ∩ DuckDB-RE2
# common subset so the DuckDB oracle verifies value-for-value.
C4_BADWORDS: tuple[str, ...] = (
    "lorem ipsum",
    "javascript",
    "cookie policy",
    "privacy policy",
    "terms of use",
    "{",
)

_TERMINAL_PUNCT_RE = "[.!?\"']$"


def c4_clean(
    df: DataFrame,
    min_words: int = 3,
    min_lines: int = 2,
    badwords: tuple[str, ...] = C4_BADWORDS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style line-level cleaning: a line survives iff it ends in
    terminal punctuation (``. ! ? " '``), has at least ``min_words``
    whitespace words, and contains no ``badwords`` phrase
    (case-insensitive).  Returns one row per input document:
    (id, clean_text, n_lines, n_kept, keep) where ``keep`` is the
    document-level verdict ``n_kept >= min_lines`` — the C4 "at least
    3 sentences" gate, parameterized.

    Scale: entirely map-only — split/filter/join are per-row array
    expressions inside whole-stage codegen; no shuffle, no UDF, and the
    parquet scan prunes to (id, text).
    """
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda s: F.trim(s)),
        lambda s: s != F.lit(""),
    )

    def _line_ok(line):
        lline = F.lower(line)
        ok = line.rlike(_TERMINAL_PUNCT_RE) & (
            F.size(
                F.filter(F.split(line, r"\s+"), lambda w: w != F.lit(""))
            )
            >= F.lit(min_words)
        )
        for bw in badwords:
            ok = ok & ~lline.contains(bw)
        return ok

    from prometheus_spark.pipeline.dedup import _spread

    kept = F.filter(lines, _line_ok)
    return _spread(df, id_col).select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        (F.size(kept) >= F.lit(min_lines)).alias("keep"),
    )


# --- deterministic splits & global shuffle ----------------------------


def _hash_bucket(id_col: str, salt: str, mod: int):
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % mod
    )


def split_corpus(
    df: DataFrame,
    fractions: Optional[dict[str, float]] = None,
    salt: str = "split1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document to a named split (train/val/test by
    default) by a pure hash of (salt, id) — reproducible across runs,
    engines, and re-partitionings, and stable under corpus growth
    (adding documents never moves an existing one between splits).

    ``fractions`` maps split name → fraction; they must sum to ≤ 1 and
    are laid out on the hash ring in SORTED-name order (deterministic
    regardless of dict ordering).  Remainder documents (if the sum is
    < 1) go to the FIRST sorted split.  Returns the input plus a
    ``split`` column.

    Scale: map-only — one hash per row, no shuffle, no UDF.
    """
    if fractions is None:
        fractions = {"test": 0.01, "train": 0.98, "val": 0.01}
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    bucket = _hash_bucket(id_col, salt, 1_000_000)
    names = sorted(fractions)
    expr = None
    acc = 0.0
    for name in names:
        acc += fractions[name]
        cond = bucket < F.lit(int(round(acc * 1_000_000)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = expr.otherwise(F.lit(names[0]))
    return df.withColumn("split", expr)


def shard_corpus(
    df: DataFrame,
    n_shards: int = 1024,
    salt: str = "shuffle1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle for training: every document gets a
    ``shard`` in [0, n_shards) and a ``shard_pos`` giving its serving
    order within the shard — both pure functions of (salt, id), so the
    epoch-0 data order is reproducible bit-for-bit on any cluster.

    Returns the input plus (shard, shard_pos).  Write with
    ``.repartition(n_shards, "shard").sortWithinPartitions("shard_pos")``
    for one output file per shard in serving order.

    Scale: one hash per row plus ONE shuffle keyed by shard; the
    within-shard ordering is a per-shard window sort (shard-sized,
    spillable) — no global sort, no driver involvement.  n_shards
    should be chosen so a shard fits one task (~corpus/n_shards rows).
    """
    order = _hash_bucket(id_col, salt + ":ord", 1_000_000_000)
    shard = _hash_bucket(id_col, salt + ":shard", n_shards)
    w = Window.partitionBy("shard").orderBy(
        F.col("__ord").asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("shard", shard)
        .withColumn("__ord", order)
        .withColumn("shard_pos", F.row_number().over(w).cast("long"))
        .drop("__ord")
    )


# --- Gopher quality rules ----------------------------------------------

#: The required-stopword set from the MassiveWeb filter (Gopher,
#: Rae et al. 2021, Appendix A.1.1): a document must contain at least
#: ``min_stop_hits`` of these as whole words.
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_quality(
    df: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style document quality rules (MassiveWeb heuristics,
    Rae et al. 2021 Appendix A.1.1) as one map-only column plan.

    Emits one row per document with every rule's statistic plus the
    combined ``keep`` verdict: word count in [min_words, max_words],
    mean word length in [min_mean_word_len, max_mean_word_len],
    ``#``/``...`` symbol-to-word ratio below ``max_symbol_ratio``,
    fraction of bullet-initial lines below ``max_bullet_frac``,
    fraction of ellipsis-terminal lines below ``max_ellipsis_frac``,
    fraction of words containing an alphabetic character above
    ``min_alpha_frac``, and at least ``min_stop_hits`` of ``stopwords``
    present as whole words.

    All ratios are rounded to 6 decimals so results are exactly
    reproducible across engines (the driver's DuckDB oracle compares
    values).  Scale: pure per-row array expressions inside whole-stage
    codegen — no UDF, no shuffle; the parquet scan prunes to
    (id, text).
    """
    words = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != F.lit("")
    )
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda s: F.trim(s)),
        lambda s: s != F.lit(""),
    )
    from prometheus_spark.pipeline.dedup import _spread

    staged = _spread(df, id_col).select(
        F.col(id_col),
        F.col(text_col).alias("__t"),
        words.alias("__w"),
        lines.alias("__l"),
    )

    n_words = F.size("__w").cast("long")
    n_lines = F.size("__l")
    # '#' occurrences + '...' occurrences (each 3 chars), over the word count
    n_hash = F.length("__t") - F.length(F.replace(F.col("__t"), F.lit("#")))
    n_ellipsis = (
        F.length("__t") - F.length(F.replace(F.col("__t"), F.lit("...")))
    ) / F.lit(3)
    mean_wl = F.aggregate(
        "__w", F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    ).cast("double")
    n_alpha = F.size(F.filter("__w", lambda w: w.rlike("[A-Za-z]")))
    n_bullet = F.size(F.filter("__l", lambda s: s.rlike("^[-*•·]")))
    n_ell_lines = F.size(F.filter("__l", lambda s: s.rlike(r"(\.\.\.|…)$")))
    lower_words = F.transform("__w", lambda w: F.lower(w))
    stop_hits = None
    for s in stopwords:
        hit = F.array_contains(lower_words, s).cast("long")
        stop_hits = hit if stop_hits is None else stop_hits + hit

    def _ratio(num, den):
        return F.when(den > 0, F.round(num / den, 6)).otherwise(F.lit(0.0))

    stats = staged.select(
        F.col(id_col),
        n_words.alias("n_words"),
        _ratio(mean_wl, n_words).alias("mean_word_len"),
        _ratio(n_hash + n_ellipsis, n_words).alias("symbol_ratio"),
        _ratio(n_bullet, n_lines).alias("frac_bullet_lines"),
        _ratio(n_ell_lines, n_lines).alias("frac_ellipsis_lines"),
        _ratio(n_alpha, n_words).alias("frac_alpha_words"),
        stop_hits.alias("n_stop_hits"),
    )
    return stats.withColumn(
        "keep",
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_ratio") < max_symbol_ratio)
        & (F.col("frac_bullet_lines") < max_bullet_frac)
        & (F.col("frac_ellipsis_lines") < max_ellipsis_frac)
        & (F.col("frac_alpha_words") > min_alpha_frac)
        & (F.col("n_stop_hits") >= min_stop_hits),
    )
