"""prometheus_spark — a PySpark-native time-series analytics engine.

A brand-new engine with the query and data-processing capabilities of
prometheus/prometheus, re-expressed Spark-first: the PromQL language is
parsed by a hand-written recursive-descent parser, planned bottom-up into
DataFrame transformations keyed by ``(sig, t)``, and executed by Catalyst.

Reference semantics (what to compute, never how) are cited per-module as
``/root/reference/<file>:<line>``.
"""

__all__ = ["PromQLEngine", "SAMPLE_SCHEMA"]

__version__ = "0.1.0"


def __getattr__(name):  # lazy to keep parser importable without pyspark
    if name == "PromQLEngine":
        from prometheus_spark.engine.engine import PromQLEngine

        return PromQLEngine
    if name == "SAMPLE_SCHEMA":
        from prometheus_spark.model.schema import SAMPLE_SCHEMA

        return SAMPLE_SCHEMA
    raise AttributeError(name)
