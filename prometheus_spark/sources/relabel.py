"""Relabeling — ingest-time label rewriting (reference:
model/relabel/relabel.go:47-70 action enum, apply at relabel.go:274).

All actions are pure map-column expressions over ``labels`` — relabeling
runs inside the ingest scan with whole-stage codegen, no UDFs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class RelabelConfig:
    action: str = "replace"  # replace keep drop keepequal dropequal hashmod
    #                          labelmap labeldrop labelkeep lowercase uppercase
    source_labels: list[str] = field(default_factory=list)
    separator: str = ";"
    regex: str = "(.*)"
    target_label: str = ""
    replacement: str = "$1"
    modulus: int = 0


def _concat_sources(cfg: RelabelConfig) -> Column:
    parts = [
        F.coalesce(F.element_at("labels", F.lit(s)), F.lit("")) for s in cfg.source_labels
    ]
    return F.concat_ws(cfg.separator, *parts) if parts else F.lit("")


def _anchored(regex: str) -> str:
    return f"^(?:{regex})$"


def apply_relabel(df: DataFrame, configs: list[RelabelConfig]) -> DataFrame:
    """Apply the relabel pipeline; rows whose label set is dropped are
    filtered out (action keep/drop/keepequal/dropequal)."""
    for cfg in configs:
        df = _apply_one(df, cfg)
    return df


def _apply_one(df: DataFrame, cfg: RelabelConfig) -> DataFrame:
    src = _concat_sources(cfg)
    pattern = _anchored(cfg.regex)
    labels = F.col("labels")

    if cfg.action == "keep":
        return df.filter(src.rlike(pattern))
    if cfg.action == "drop":
        return df.filter(~src.rlike(pattern))
    if cfg.action == "keepequal":
        tgt = F.coalesce(F.element_at(labels, F.lit(cfg.target_label)), F.lit(""))
        return df.filter(src == tgt)
    if cfg.action == "dropequal":
        tgt = F.coalesce(F.element_at(labels, F.lit(cfg.target_label)), F.lit(""))
        return df.filter(src != tgt)

    if cfg.action == "replace":
        matched = src.rlike(pattern)
        newv = F.regexp_replace(src, pattern, cfg.replacement)
        without = F.map_filter(labels, lambda k, _: k != F.lit(cfg.target_label))
        with_tgt = F.map_concat(without, F.create_map(F.lit(cfg.target_label), newv))
        new_labels = F.when(~matched, labels).otherwise(
            F.when(newv == "", without).otherwise(with_tgt)
        )
        return df.withColumn("labels", new_labels)

    if cfg.action == "hashmod":
        # deterministic bucket label: hash(src) % modulus.  The reference
        # uses md5; we match that so configs are portable.
        h = F.conv(F.substring(F.md5(src), 17, 16), 16, 10).cast("decimal(38,0)")
        mod = (h % cfg.modulus).cast("string")
        without = F.map_filter(labels, lambda k, _: k != F.lit(cfg.target_label))
        return df.withColumn(
            "labels", F.map_concat(without, F.create_map(F.lit(cfg.target_label), mod))
        )

    if cfg.action == "labelmap":
        # copy each matching label name through the replacement template
        re.compile(cfg.regex)
        entries = F.map_entries(labels)
        mapped = F.filter(entries, lambda e: e["key"].rlike(pattern))
        renamed = F.transform(
            mapped,
            lambda e: F.struct(
                F.regexp_replace(e["key"], pattern, cfg.replacement).alias("key"),
                e["value"].alias("value"),
            ),
        )
        new_labels = F.map_concat(
            F.map_filter(
                labels,
                lambda k, _: ~F.exists(
                    renamed, lambda r: r["key"] == k
                ),
            ),
            F.map_from_entries(renamed),
        )
        return df.withColumn(
            "labels", F.when(F.size(renamed) > 0, new_labels).otherwise(labels)
        )

    if cfg.action == "labeldrop":
        return df.withColumn(
            "labels", F.map_filter(labels, lambda k, _: ~k.rlike(pattern))
        )
    if cfg.action == "labelkeep":
        return df.withColumn(
            "labels", F.map_filter(labels, lambda k, _: k.rlike(pattern))
        )
    if cfg.action in ("lowercase", "uppercase"):
        fn = F.lower if cfg.action == "lowercase" else F.upper
        without = F.map_filter(labels, lambda k, _: k != F.lit(cfg.target_label))
        return df.withColumn(
            "labels",
            F.map_concat(without, F.create_map(F.lit(cfg.target_label), fn(src))),
        )
    raise ValueError(f"unknown relabel action {cfg.action!r}")


# -- driver-side single-labelset path ----------------------------------------

def _expand_go(template: str, m: "re.Match") -> str:
    """Expand Go-style ``$1`` / ``${name}`` references using a Python
    match (reference regexp.Expand semantics used by relabel.go:311)."""
    def sub(mm: "re.Match") -> str:
        name = mm.group(1) or mm.group(2)
        if name is None:
            return ""
        try:
            if name.isdigit():
                return m.group(int(name)) or ""
            return m.group(name) or ""
        except (IndexError, re.error):
            return ""
    return re.sub(r"\$(?:\{(\w+)\}|(\w+))", sub, template)


def process_labels(
    labels: dict, configs: list["RelabelConfig"]
) -> Optional[dict]:
    """Relabel one label set on the driver (reference
    model/relabel/relabel.go:274 ``Process``).  Returns None when the
    label set is dropped.  Used where cardinality is inherently small —
    alert notification relabeling (notifier/alert.go:71) and scrape
    target relabeling — while ``apply_relabel`` stays the distributed
    path for sample streams.
    """
    lset = dict(labels)
    for cfg in configs:
        val = cfg.separator.join(lset.get(l, "") for l in cfg.source_labels)
        pat = re.compile(r"^(?:" + cfg.regex + r")$")
        m = pat.match(val)
        act = cfg.action
        if act == "keep":
            if m is None:
                return None
        elif act == "drop":
            if m is not None:
                return None
        elif act == "keepequal":
            if val != lset.get(cfg.target_label, ""):
                return None
        elif act == "dropequal":
            if val == lset.get(cfg.target_label, ""):
                return None
        elif act == "replace":
            if m is None:
                continue
            target = _expand_go(cfg.target_label, m)
            repl = _expand_go(cfg.replacement, m)
            if not target:
                continue
            if repl == "":
                lset.pop(target, None)
            else:
                lset[target] = repl
        elif act == "hashmod":
            import hashlib

            h = hashlib.md5(val.encode()).digest()
            lset[cfg.target_label] = str(
                int.from_bytes(h[8:16], "big") % cfg.modulus
            )
        elif act == "labelmap":
            for k in list(lset):
                km = pat.match(k)
                if km is not None:
                    lset[_expand_go(cfg.replacement, km)] = lset[k]
        elif act == "labeldrop":
            lset = {k: v for k, v in lset.items() if not pat.match(k)}
        elif act == "labelkeep":
            lset = {k: v for k, v in lset.items() if pat.match(k)}
        elif act in ("lowercase", "uppercase"):
            lset[cfg.target_label] = (
                val.lower() if act == "lowercase" else val.upper()
            )
        else:
            raise ValueError(f"unknown relabel action {act!r}")
    return lset
