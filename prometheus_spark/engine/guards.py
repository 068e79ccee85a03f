"""Runtime error guards — JVM-side ``raise_error`` expressions.

The reference errors on vectors containing duplicate label sets after an
operation changed the metric schema (engine.go:4283
``mergeSeriesWithSameLabelset``, errors at 4295 for instant vectors).  A
window count over ``(sig, t)`` folded into the value column keeps the check
inside the same Catalyst plan — no extra job, pruning-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def check_unique_labelsets(
    df: DataFrame,
    msg: str = "vector cannot contain metrics with the same labelset",
) -> DataFrame:
    w = Window.partitionBy("sig", "t")
    guard = F.when(
        F.count(F.lit(1)).over(w) > 1,
        F.raise_error(F.concat(F.lit(msg + ": "), F.col("sig"))).cast("double"),
    )
    return df.withColumn("value", F.col("value") + F.coalesce(guard, F.lit(0.0)))
