"""Prometheus text exposition format parser (ingest boundary).

Reference: model/textparse/promparse.go (line-oriented format:
``metric{l="v",...} value [timestamp_ms]``, ``# HELP/# TYPE`` comments).
Re-derived line grammar, not a translation.

The batch/streaming entry point is ``parse_exposition_df`` — an
Arrow-batched ``mapInPandas`` over raw lines (ingest parse is the one
place a Python inner loop is acceptable: it runs once per scraped byte,
not per query, and stays vectorized at the batch level).
"""

from __future__ import annotations

import math
import re
from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_LINE_RE = re.compile(
    r"""^
    (?:
      (?P<name>[a-zA-Z_:][a-zA-Z0-9_:]*)
      (?:\{(?P<labels>.*)\})?
      |
      \{(?P<qlabels>.*)\}   # UTF-8 names: {"metric.name","l.x"="v"}
    )
    \s+
    (?P<value>[^\s]+)
    (?:\s+(?P<ts>-?\d+))?
    \s*$""",
    re.VERBOSE,
)
_LABEL_RE = re.compile(
    r'\s*(?P<k>[a-zA-Z_][a-zA-Z0-9_]*)\s*=\s*"(?P<v>(?:\\.|[^"\\])*)"\s*(?:,|$)'
)
# UTF-8 name extension (textparse; OpenMetrics 1.0 quoted names): label
# names — and a leading bare string carrying the metric name — are
# double-quoted inside the brace block: {"metric.name","l.x"="v"}
_QLABEL_RE = re.compile(
    r'\s*"(?P<k>(?:\\.|[^"\\])*)"\s*=\s*"(?P<v>(?:\\.|[^"\\])*)"\s*(?:,|$)'
)
_QNAME_RE = re.compile(r'\s*"(?P<n>(?:\\.|[^"\\])*)"\s*(?:,|$)')
_ESCAPES = {"\\n": "\n", "\\\\": "\\", '\\"': '"'}


def parse_labelblob_utf8(blob: str, line: str, allow_name: bool) -> dict:
    """Brace-block contents → labels dict.  Accepts classic pairs,
    quoted-name pairs, and (``allow_name``) one leading bare quoted
    string that becomes ``__name__``."""
    labels: dict[str, str] = {}
    pos = 0
    first = True
    while pos < len(blob):
        lm = _LABEL_RE.match(blob, pos) or _QLABEL_RE.match(blob, pos)
        if lm:
            labels[_unescape(lm.group("k")) if lm.re is _QLABEL_RE
                   else lm.group("k")] = _unescape(lm.group("v"))
            pos = lm.end()
            first = False
            continue
        if first and allow_name:
            nm = _QNAME_RE.match(blob, pos)
            if nm:
                labels["__name__"] = _unescape(nm.group("n"))
                pos = nm.end()
                first = False
                continue
        if blob[pos:].strip() in ("", ","):
            break
        raise ValueError(f"invalid labels in line: {line!r}")
    return labels


def _unescape(v: str) -> str:
    """Single-pass unescape (textparse replacer semantics): sequential
    str.replace would mis-decode ``\\\\n`` (escaped backslash followed
    by a literal n) as backslash+newline because the second replace sees
    the freshly-produced backslash."""
    if "\\" not in v:
        return v
    out = []
    i = 0
    n = len(v)
    while i < n:
        c = v[i]
        if c == "\\" and i + 1 < n:
            out.append(_ESCAPES.get(v[i : i + 2], v[i : i + 2]))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _parse_value(s: str) -> float:
    ls = s.lower()
    if ls in ("+inf", "inf"):
        return math.inf
    if ls == "-inf":
        return -math.inf
    if ls == "nan":
        return math.nan
    return float(s)


def parse_exposition_text(
    text: str, default_ts_ms: int = 0
) -> list[tuple[dict, int, float]]:
    """Parse one scrape body → [(labels incl __name__, t_ms, value)]."""
    out = []
    for line in text.split("\n"):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = _LINE_RE.match(line)
        if not m:
            raise ValueError(f"invalid exposition line: {line!r}")
        if m.group("qlabels") is not None:
            # UTF-8 quoted-name form: {"metric.name","l"="v"} value
            labels = parse_labelblob_utf8(m.group("qlabels"), line, True)
            if "__name__" not in labels:
                raise ValueError(f"missing metric name in line: {line!r}")
        else:
            labels = {"__name__": m.group("name")}
            blob = m.group("labels")
            if blob:
                labels.update(parse_labelblob_utf8(blob, line, False))
        ts = int(m.group("ts")) if m.group("ts") else default_ts_ms
        out.append((labels, ts, _parse_value(m.group("value"))))
    return out


# Arrow's pandas converter can't build map columns — ship parallel arrays
# and assemble the map JVM-side in to_samples()
PARSED_SCHEMA = T.StructType(
    [
        T.StructField("label_keys", T.ArrayType(T.StringType()), False),
        T.StructField("label_values", T.ArrayType(T.StringType()), False),
        T.StructField("t", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)


# Fast-path classifier: a line is JVM-parseable when it has a classic
# metric name, a brace block of classic keys with BACKSLASH-FREE quoted
# values (no escapes ⇒ every '"' is structural, so the blob splits on
# '",' boundaries without a state machine), a numeric/inf/nan value
# token, and an optional ≤18-digit timestamp.  Everything else (UTF-8
# quoted names, escaped label values, exotic float spellings like
# '1_0' or 'infinity', oversized timestamps) takes the Python parser.
_FAST_PAIR = r'[a-zA-Z_][a-zA-Z0-9_]*\s*=\s*"[^"\\]*"'
_FAST_LINE_RE = (
    r"^[a-zA-Z_:][a-zA-Z0-9_:]*"
    r"(\{\s*(" + _FAST_PAIR + r"(\s*,\s*" + _FAST_PAIR + r")*(\s*,)?\s*)?\})?"
    r"\s+([+-]?(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][+-]?[0-9]+)?"
    r"|[+-]?(?:[iI][nN][fF]|[nN][aA][nN]))"
    r"(\s+-?[0-9]{1,18})?\s*$"
)


def _fast_parse_cols(s, default_ts):
    """The four parsed columns (label_keys, label_values, t, value) as
    whole-stage-codegen expressions over a trimmed fast-classified line
    column ``s``."""
    from pyspark.sql import functions as F
    name = F.regexp_extract(s, r"^([a-zA-Z_:][a-zA-Z0-9_:]*)", 1)
    blob = F.regexp_extract(s, r"^[a-zA-Z_:][a-zA-Z0-9_:]*\{(.*)\}", 1)
    # value/timestamp live after the LAST '}' (value and ts are
    # brace-free by classification; label values may contain '}')
    tail = (
        F.when(s.contains("{"), F.regexp_extract(s, r"\}([^}]*)$", 1))
        .otherwise(F.regexp_replace(s, r"^[a-zA-Z_:][a-zA-Z0-9_:]*", ""))
    )
    tokens = F.split(F.trim(tail), r"\s+")
    value_tok = F.element_at(tokens, 1)
    lv = F.lower(value_tok)
    value = (
        F.when(lv.isin("inf", "+inf"), F.lit(float("inf")))
        .when(lv == "-inf", F.lit(float("-inf")))
        .when(lv.endswith("nan"), F.lit(float("nan")))
        .otherwise(value_tok.cast("double"))
    )
    ts_parsed = F.when(
        F.size(tokens) >= 2, F.element_at(tokens, 2).cast("long")
    )
    t = F.coalesce(ts_parsed, default_ts)
    # '",'-boundary split keeps both quotes on every pair (lookbehind),
    # so inner whitespace of quoted values survives the per-pair trim.
    # (A single-transform entry-struct variant was measured SLOWER than
    # these parallel primitive-array transforms — per-pair struct
    # allocation outweighs the saved traversals.)
    parts = F.split(blob, r'(?<=")\s*,')
    parts = F.filter(
        F.transform(parts, lambda p: F.trim(p)), lambda p: p != F.lit("")
    )
    keys = F.transform(parts, lambda p: F.trim(F.substring_index(p, "=", 1)))
    raw_vals = F.transform(
        parts,
        lambda p: F.trim(F.substr(p, F.instr(p, "=") + F.lit(1), F.length(p))),
    )
    vals = F.transform(
        raw_vals, lambda q: F.substr(q, F.lit(2), F.length(q) - F.lit(2))
    )
    return (
        F.concat(F.array(F.lit("__name__")), keys).alias("label_keys"),
        F.concat(F.array(name), vals).alias("label_values"),
        t.alias("t"),
        value.alias("value"),
    )


def parse_exposition_df(
    lines: DataFrame, line_col: str = "line", ts_col: Optional[str] = None
) -> DataFrame:
    """Raw-lines DataFrame → parsed samples (labels, t, value).

    Works identically on a batch frame or a ``readStream`` frame (e.g.
    file/socket/Kafka source) — append ``.writeStream`` downstream for
    streaming ingest with checkpointing as the WAL equivalent.

    Ingest is parse-bound (BENCH_INGEST: the Python line parser was ~87%
    of pipeline cost), so lines matching a strict classifier regex are
    parsed entirely JVM-side inside whole-stage codegen; only lines the
    fast grammar can't express (escapes, quoted UTF-8 names, exotic
    float spellings) go through the Arrow-batched Python parser.  Set
    ``PROMSPARK_PROMTEXT_JVM=0`` to force the Python path everywhere
    (parity sweeps / A-B timing).
    """
    import os

    from pyspark.sql import functions as F

    cols = [line_col] + ([ts_col] if ts_col else [])
    src = lines.select(*cols)

    if os.environ.get("PROMSPARK_PROMTEXT_JVM", "1") != "0":
        return _parse_hybrid_onepass(src, line_col, ts_col)
    return _parse_python(src, line_col, ts_col)


def _parse_hybrid_onepass(
    src: DataFrame, line_col: str, ts_col: Optional[str]
) -> DataFrame:
    """Hybrid fast/slow parse — filter + union.

    A true one-pass formulation was built and MEASURED SLOWER (round 12):
    wrapping the fast parse in ``explode(array(struct(...)))`` so slow
    lines' multi-sample arrays could share one projection costs +2.7 s
    on 4.5M lines (per-row array+struct allocation through Generate) and
    the null-input Arrow UDF node adds another ~1 s — 4.9 s total vs
    1.8 s for this shape.  The union's duplicated work is small: the
    classifier regex is 0.33 s/pass and the source re-scan is a
    localCheckpoint/file read, while each branch keeps a flat
    whole-stage-codegen projection.
    """
    from pyspark.sql import functions as F

    s = F.trim(F.col(line_col))
    is_content = (s != F.lit("")) & (~s.startswith("#"))
    default_ts = F.col(ts_col).cast("long") if ts_col else F.lit(0).cast("long")
    is_fast = is_content & s.rlike(_FAST_LINE_RE)
    fast = src.filter(is_fast).select(*_fast_parse_cols(s, default_ts))
    slow = _parse_python(
        src.filter(is_content & ~s.rlike(_FAST_LINE_RE)), line_col, ts_col
    )
    return fast.unionByName(slow)


def _parse_python(src: DataFrame, line_col: str, ts_col: Optional[str]) -> DataFrame:
    """The Arrow-batched Python parser (full grammar)."""
    import pandas as pd

    from prometheus_spark.shipping import ensure_shipped

    ensure_shipped(src.sparkSession)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out_k, out_vv, out_t, out_v = [], [], [], []
            for i, line in enumerate(pdf[line_col]):
                default_ts = int(pdf[ts_col].iloc[i]) if ts_col else 0
                line = (line or "").strip()
                if not line or line.startswith("#"):
                    continue
                for labels, t, v in parse_exposition_text(line, default_ts):
                    out_k.append(list(labels.keys()))
                    out_vv.append(list(labels.values()))
                    out_t.append(t)
                    out_v.append(v)
            # explicit dtypes: an empty partition would otherwise default
            # to float64 columns, which Arrow can't cast to list<string>
            yield pd.DataFrame(
                {
                    "label_keys": pd.Series(out_k, dtype=object),
                    "label_values": pd.Series(out_vv, dtype=object),
                    "t": pd.Series(out_t, dtype="int64"),
                    "value": pd.Series(out_v, dtype="float64"),
                }
            )

    parsed = src.mapInPandas(batches, PARSED_SCHEMA)
    # pandas→Arrow folds float NaN into null; the parser itself never
    # emits null (every sample line has a float value), so any null here
    # IS a NaN sample — restore it (a scraped NaN must ingest as NaN)
    from pyspark.sql import functions as F

    return parsed.withColumn(
        "value", F.coalesce(F.col("value"), F.lit(float("nan")))
    )


def to_samples(parsed: DataFrame) -> DataFrame:
    """Parsed rows → canonical samples layout (adds sig/name/stale)."""
    from pyspark.sql import functions as F

    from prometheus_spark.model.labels import KV_SEP, PAIR_SEP

    # signature straight from the parallel arrays: building the map first
    # and re-extracting entries (sig_expr) costs an extra per-row
    # map build + entries pass — measured 0.55 s / 4.5M samples on the
    # append stage; byte-identical sigs (exceptAll == 0 rows)
    entries = F.array_sort(
        F.arrays_zip(
            F.col("label_keys").alias("key"),
            F.col("label_values").alias("value"),
        )
    )
    sig = F.array_join(
        F.transform(entries, lambda e: F.concat_ws(KV_SEP, e["key"], e["value"])),
        PAIR_SEP,
    )
    labels = F.map_from_arrays("label_keys", "label_values")
    return parsed.select(
        sig.alias("sig"),
        F.element_at(labels, F.lit("__name__")).alias("name"),
        labels.alias("labels"),
        "t",
        "value",
        F.lit(False).alias("stale"),
    )


def parse_exposition_metadata(text: str) -> dict:
    """Extract family metadata from ``# TYPE`` / ``# HELP`` / ``# UNIT``
    comment lines (promparse.go Type/Help comment handling) —
    family → {"type", "help", "unit"}."""
    meta: dict[str, dict] = {}
    for line in text.split("\n"):
        line = line.strip()
        if not line.startswith("#"):
            continue
        parts = line.split(None, 3)
        if len(parts) < 3 or parts[1] not in ("TYPE", "HELP", "UNIT"):
            continue
        fam = parts[2]
        slot = meta.setdefault(
            fam, {"type": "unknown", "help": "", "unit": ""}
        )
        if parts[1] == "TYPE":
            slot["type"] = parts[3].strip() if len(parts) > 3 else "unknown"
        elif parts[1] == "HELP":
            slot["help"] = parts[3] if len(parts) > 3 else ""
        else:
            slot["unit"] = parts[3].strip() if len(parts) > 3 else ""
    return meta
