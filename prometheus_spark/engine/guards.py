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
    from prometheus_spark.model.labels import sql_str_lit

    guard = (
        "coalesce(CASE WHEN count(1) OVER (PARTITION BY sig, t) > 1 THEN "
        f"CAST(raise_error(concat({sql_str_lit(msg + ': ')}, sig)) AS DOUBLE) "
        "END, 0.0D)"
    )
    return df.withColumn("value", F.expr(f"value + {guard}"))
