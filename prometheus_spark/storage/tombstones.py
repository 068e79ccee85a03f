"""Query-time deletion tombstones.

The reference deletes series by writing tombstone intervals that are
applied as anti-filters at read time, with an explicit compaction step
that rewrites blocks without the deleted data
(reference: tsdb/tombstones/tombstones.go, tsdb/db.go Delete,
web/api/v1/api.go admin deleteSeries/cleanTombstones).

Spark-first mapping: a tombstone is a Catalyst predicate over the
canonical samples frame — `apply()` stacks `filter(NOT pred)` onto any
plan, so deletions are visible to every query immediately without
touching storage, and `clean()` is the compaction: materialize the
filtered frame back to Parquet and drop the stones.  At 100 TB the
filter is pushed into the scan where the matcher touches the hot
`name` column, and compaction is a partition-pruned rewrite of only
the time buckets a stone overlaps.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Tombstone:
    matchers: list  # list[parser.ast.Matcher]
    mint_ms: Optional[int] = None  # inclusive; None = -inf
    maxt_ms: Optional[int] = None  # inclusive; None = +inf

    def predicate(self) -> Column:
        from prometheus_spark.engine.selectors import matcher_predicate

        cond = matcher_predicate(list(self.matchers))
        if self.mint_ms is not None:
            cond = cond & (F.col("t") >= F.lit(int(self.mint_ms)))
        if self.maxt_ms is not None:
            cond = cond & (F.col("t") <= F.lit(int(self.maxt_ms)))
        return cond


@dataclass
class TombstoneStore:
    """Accumulates deletion intervals; ``apply`` masks them at read time."""

    stones: list[Tombstone] = field(default_factory=list)

    def add(self, matchers, mint_ms=None, maxt_ms=None) -> Tombstone:
        stone = Tombstone(list(matchers), mint_ms, maxt_ms)
        self.stones.append(stone)
        return stone

    def predicate(self) -> Optional[Column]:
        if not self.stones:
            return None
        cond = self.stones[0].predicate()
        for s in self.stones[1:]:
            cond = cond | s.predicate()
        return cond

    def apply(self, samples: DataFrame) -> DataFrame:
        pred = self.predicate()
        if pred is None:
            return samples
        return samples.filter(~pred)

    def clean(self, samples: DataFrame, path: Optional[str] = None) -> DataFrame:
        """Compaction: materialize the masked frame (optionally rewriting
        the Parquet layout at ``path``) and drop the stones."""
        cleaned = self.apply(samples)
        if path is not None:
            from prometheus_spark.storage.samples import write_samples

            write_samples(cleaned, path)
        self.stones = []
        return cleaned


def parse_delete_matchers(selector: str):
    """A `match[]` series selector string → its label matchers.

    Accepts the same grammar as /api/v1/series (reference
    parser.ParseMetricSelector).
    """
    from prometheus_spark.parser import parse_expr
    from prometheus_spark.parser.ast import VectorSelector

    node = parse_expr(selector)
    if not isinstance(node, VectorSelector):
        raise ValueError(f"not a series selector: {selector!r}")
    return list(node.matchers)
