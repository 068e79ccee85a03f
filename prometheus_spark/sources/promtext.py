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


def parse_exposition_df(
    lines: DataFrame, line_col: str = "line", ts_col: Optional[str] = None
) -> DataFrame:
    """Raw-lines DataFrame → parsed samples (labels, t, value).

    Works identically on a batch frame or a ``readStream`` frame (e.g.
    file/socket/Kafka source) — append ``.writeStream`` downstream for
    streaming ingest with checkpointing as the WAL equivalent.
    """
    import pandas as pd

    from prometheus_spark.shipping import ensure_shipped

    ensure_shipped(lines.sparkSession)
    cols = [line_col] + ([ts_col] if ts_col else [])
    src = lines.select(*cols)

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

    return src.mapInPandas(batches, PARSED_SCHEMA)


def to_samples(parsed: DataFrame) -> DataFrame:
    """Parsed rows → canonical samples layout (adds sig/name/stale)."""
    from pyspark.sql import functions as F

    from prometheus_spark.model.labels import sig_expr

    labels = F.map_from_arrays("label_keys", "label_values")
    return parsed.select(
        sig_expr(labels).alias("sig"),
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
