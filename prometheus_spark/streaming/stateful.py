"""Custom stateful streaming operators built on
``applyInPandasWithState`` — per-series state that survives across
micro-batches, for semantics Structured Streaming's built-in windowed
aggregations can't express.

``streaming_counter_increase`` is the incremental form of PromQL's
``increase()``/``resets()`` (reference promql/functions.go extrapolation
family, minus the window extrapolation — this is the *ingest-time*
running total): for every monotonic-counter sample it emits the
cumulative increase since the stream began, applying the reference's
counter-reset correction (a value drop means the counter restarted, so
the new value IS the delta — promql/functions.go:extrapolatedRate reset
handling) across batch boundaries.

Scale: state is (last_v, cum_inc, resets) per series — three scalars —
partitioned by the series key across executors by the state store;
per-batch work is one Arrow-batched pass over each key's new samples in
timestamp order.  No driver involvement, checkpointable, and the state
store shuffles only the (tiny) state rows, never history.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("sig", StringType()),
        StructField("t", LongType()),
        StructField("value", DoubleType()),
        StructField("cum_increase", DoubleType()),
        StructField("resets", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("last_v", DoubleType()),
        StructField("cum_inc", DoubleType()),
        StructField("resets", LongType()),
    ]
)


def _increase_fn(
    key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
):
    if state.exists:
        last_v, cum_inc, resets = state.get
    else:
        last_v, cum_inc, resets = None, 0.0, 0
    out_t, out_v, out_ci, out_rs = [], [], [], []
    # a group's micro-batch arrives as MULTIPLE Arrow chunks whose
    # relative order follows the shuffle, not the timestamp — sorting
    # per-chunk silently mis-orders multi-chunk groups once the input
    # has >1 scan partition (surfaced by the sf1 oracle run; invisible
    # at small scale where file order == t order).  Concatenate the
    # whole batch, sort once; buffering is bounded by the group's rows
    # in ONE micro-batch, the same bound applyInPandasWithState already
    # imposes on state-function authors.
    batch = list(pdfs)
    whole = (
        pd.concat(batch, ignore_index=True).sort_values("t")
        if len(batch) > 1
        else (batch[0].sort_values("t") if batch else pd.DataFrame(columns=["t", "value"]))
    )
    for pdf in (whole,):
        for t, v in zip(pdf["t"], pdf["value"]):
            if last_v is None:
                pass  # first sample starts the counter; no increase yet
            elif v < last_v:
                resets += 1
                cum_inc += v  # reset: counter restarted from 0
            else:
                cum_inc += v - last_v
            last_v = float(v)
            out_t.append(int(t))
            out_v.append(float(v))
            out_ci.append(cum_inc)
            out_rs.append(resets)
    state.update((last_v, cum_inc, resets))
    yield pd.DataFrame(
        {
            "sig": [key[0]] * len(out_t),
            "t": pd.Series(out_t, dtype="int64"),
            "value": pd.Series(out_v, dtype="float64"),
            "cum_increase": pd.Series(out_ci, dtype="float64"),
            "resets": pd.Series(out_rs, dtype="int64"),
        }
    )


def streaming_counter_increase(stream: DataFrame) -> DataFrame:
    """Running counter increase over a streaming (sig, t, value) frame.

    Emits one row per input sample with ``cum_increase`` (total counted
    increase since stream start, reset-corrected) and ``resets`` (resets
    observed so far).  Update output mode; keyed state per ``sig``.
    """
    from prometheus_spark.shipping import ensure_shipped

    ensure_shipped(stream.sparkSession)
    return stream.groupBy("sig").applyInPandasWithState(
        _increase_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
