"""Runtime value representations flowing between operators.

PromQL's four static types (reference: promql/parser/value.go) map to:

- scalar   → :class:`ConstScalar` (plan-time constant, step-invariant) or
             :class:`ScalarFrame` (one row per step: ``(t, value)``)
- string   → :class:`StringValue`
- vector   → :class:`VectorFrame` — ``(sig, labels, t, sample_t, value,
             drop_name)``, one row per (series, step); absent rows =
             absent series.  ``drop_name`` implements the reference's
             *delayed name removal*: meaning-changing ops flag the row
             instead of physically removing ``__name__``/``__type__``/
             ``__unit__``; the metadata labels stay visible to grouping,
             matching and label functions, and are stripped once at
             result finalization (engine.py) — where the duplicate-
             labelset check also runs.
- matrix   → handled structurally: range selectors/subqueries feed the
             range-function framework as windowed sample frames
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VECTOR_COLS = ["sig", "labels", "t", "sample_t", "value", "drop_name"]


def ensure_drop_name(df: DataFrame) -> DataFrame:
    """Attach drop_name=false to frames predating the flag (raw samples)."""
    if "drop_name" not in df.columns:
        df = df.withColumn("drop_name", F.lit(False))
    return df


@dataclass
class ConstScalar:
    value: float


@dataclass
class StringValue:
    value: str


@dataclass
class ScalarFrame:
    df: DataFrame  # (t LONG, value DOUBLE) — exactly one row per step


class VectorFrame:
    """Vector value — one row per (series, step).

    Two physical representations (round 11 frame contract):

    - **split** (preferred): ``fact`` carries the narrow per-step rows
      ``(sig, t, sample_t, value, drop_name[, hist][, st])`` and ``dim``
      carries the per-series labels ``(sig, labels)``.  Shuffles, sorts
      and window explodes move only the fact; anything label-derived
      (group keys, match keys, output labelsets) is computed on the dim
      — one row per series, not per sample — and joined back by ``sig``.
      At fleet-typical 20-40 labels/series the labels map dwarfs the
      numeric columns, so this is the difference between shuffling
      bytes and shuffling kilobytes per row (measured 1.6-2.1x on a
      24-label synthetic).
    - **legacy**: one ``df`` with ``labels`` inline (VECTOR_COLS order).
      Kept for literal/synthetic frames and as a migration bridge.

    Either view is derivable lazily: ``.df`` joins fact⋈dim once;
    ``.fact`` drops the labels column; ``.dim`` re-derives per-sig
    labels with a partial-aggregating groupBy.  NOTE: deriving ``.dim``
    from a legacy frame re-executes the upstream plan for that branch —
    producers should construct split frames so this bridge stays cold.
    """

    __slots__ = ("_df", "_fact", "_dim", "est_series", "est_sig_bytes")

    def __init__(
        self,
        df: DataFrame = None,
        *,
        fact: DataFrame = None,
        dim: DataFrame = None,
        est_series: "int | None" = None,
        est_sig_bytes: "float | None" = None,
    ):
        if df is None and (fact is None or dim is None):
            raise ValueError("VectorFrame needs df or (fact and dim)")
        self._df = df
        self._fact = fact
        self._dim = dim
        # Plan-time cardinality estimate: an UPPER BOUND on this frame's
        # distinct series (and their mean canonical-sig width), seeded by
        # selectors from the engine's per-metric-name stats and carried
        # through series-preserving operators.  None = unknown — readers
        # (EvalContext.sig_inline_ok) fall back to whole-frame totals,
        # which is conservative toward the dim-join path.
        self.est_series = est_series
        self.est_sig_bytes = est_sig_bytes

    def est_from(self, src: "VectorFrame") -> "VectorFrame":
        """Inherit the series estimate from ``src`` (for outputs whose
        series set is a subset of ``src``'s — rate family, math
        functions, filters)."""
        self.est_series = src.est_series
        self.est_sig_bytes = src.est_sig_bytes
        return self

    @property
    def is_split(self) -> bool:
        return self._fact is not None

    @property
    def df(self) -> DataFrame:
        if self._df is None:
            fact, dim = self._fact, self._dim
            extras = [c for c in fact.columns if c not in VECTOR_COLS]
            order = [
                c for c in VECTOR_COLS if c in fact.columns or c == "labels"
            ] + extras
            self._df = fact.join(dim, "sig").select(*order)
        return self._df

    @property
    def fact(self) -> DataFrame:
        if self._fact is None:
            self._fact = self._df.drop("labels")
        return self._fact

    @property
    def dim(self) -> DataFrame:
        if self._dim is None:
            self._dim = (
                self._df.select("sig", "labels")
                .groupBy("sig")
                .agg(F.first("labels").alias("labels"))
            )
        return self._dim


def scalar_frame_from_const(ctx, value: float) -> ScalarFrame:
    return ScalarFrame(ctx.grid.select(F.col("t"), F.lit(float(value)).alias("value")))
