"""Deduplication operators for large-scale training-data pipelines.

All hot paths are JVM-side column expressions (shingling via
``transform(sequence(...))``, minhash via per-permutation ``min(xxhash64)``
aggregates) — no Python UDFs.  At 100 TB the only shuffles are the
groupBy(doc) signature build and the band-bucket join, both keyed small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _word_ngrams(text: Column, n: int) -> Column:
    """Distinct word n-grams (lowercased, whitespace-tokenized)."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    count = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(0), count - 1),
        lambda i: F.array_join(F.slice(words, i + 1, n), " "),
    )
    return F.array_distinct(F.when(count > 0, grams).otherwise(F.array().cast("array<string>")))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate removal: md5-hash groupBy keeping the smallest id.

    One shuffle on the content hash; at scale the hash is computed at scan
    time so the shuffle carries (hash, id) pairs only.
    """
    h = F.md5(F.col(text_col))
    keep = (
        df.select(h.alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(keep, id_col, "left_semi").dropDuplicates([id_col])


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per document: h_i = min over shingles of
    xxhash64(i, shingle).  Columnar (num_perm aggregate expressions), one
    shuffle by document id; no Python in the loop."""
    grams = _word_ngrams(F.col(text_col), shingle_n)
    exploded = df.select(F.col(id_col), F.explode(grams).alias("sh"))
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"h{i}") for i in range(num_perm)
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def minhash_dup_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH banding: documents sharing any band bucket are candidate
    near-duplicates.  Returns (doc_a, doc_b) pairs with doc_a < doc_b.

    Scale path: band hashes explode to ``bands`` rows per doc; the
    self-join happens inside each (band, bucket) — skewed buckets are rare
    with 64-bit hashes and AQE splits them.
    """
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_n)
    band_hashes = F.array(
        *[
            F.xxhash64(*[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)])
            for b in range(bands)
        ]
    )
    banded = sigs.select(
        F.col(id_col), F.posexplode(band_hashes).alias("band", "bucket")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )
    return pairs


def simhash_64(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash over word hashes: bit j of the fingerprint is the
    sign of Σ_tokens (±1 depending on bit j of xxhash64(token)).

    Pure array algebra: tokens → hashes → per-bit vote fold → bits → long.
    """
    words = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda w: w != F.lit("")
    )
    exploded = df.select(F.col(id_col), F.explode(words).alias("w")).withColumn(
        "h", F.xxhash64("w")
    )
    # one vote aggregate per bit — 64 columnar sums, same shuffle as any
    # groupBy(doc); shift amounts must be literals for codegen
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(64)
    ]
    agg = exploded.groupBy(id_col).agg(*votes)
    fp = None
    for j in range(64):
        bit = F.when(F.col(f"v{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
            F.lit(0).cast("long")
        )
        fp = bit if fp is None else fp.bitwiseOR(bit)
    return agg.select(F.col(id_col), fp.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity via inverted index self-join:
    explode distinct n-grams, join on gram, count intersections, compute
    |A∩B| / (|A|+|B|−|A∩B|).  Returns (doc_a, doc_b, jaccard) ≥ threshold.

    The join is keyed by gram — the classic text-dedup plan that scales
    linearly in corpus size for bounded-frequency grams.
    """
    grams = df.select(F.col(id_col), _word_ngrams(F.col(text_col), n).alias("gs"))
    sizes = grams.select(F.col(id_col), F.size("gs").alias("sz"))
    inv = grams.select(F.col(id_col), F.explode("gs").alias("g"))
    a, b = inv.alias("a"), inv.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    out = (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    planes: int = 16,
    seed: int = 7,
) -> DataFrame:
    """Embedding cosine near-duplicates, LSH-bucketed: random-hyperplane
    sign bits bucket the vectors; exact cosine verifies candidates inside
    each bucket.  Brute force inside a bucket is fine — buckets shrink
    exponentially with ``planes``."""
    import numpy as np

    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:
        return df.sparkSession.createDataFrame([], "id_a long, id_b long, cosine double")
    dim = first["d"]
    rng = np.random.RandomState(seed)
    hyper = rng.standard_normal((planes, dim))

    def plane_bit(p: int) -> Column:
        coeffs = F.array(*[F.lit(float(c)) for c in hyper[p]])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), coeffs, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(dot >= 0, F.shiftleft(F.lit(1), p)).otherwise(F.lit(0))

    bucket = sum([plane_bit(p) for p in range(planes)], F.lit(0))
    norm = F.sqrt(
        F.aggregate(F.col(vec_col), F.lit(0.0), lambda a, x: a + x.cast("double") * x)
    )
    v = df.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"), norm.alias("norm"))
    a, b = v.alias("a"), v.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            (dot / (F.col("a.norm") * F.col("b.norm"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
