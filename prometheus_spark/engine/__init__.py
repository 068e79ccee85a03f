from prometheus_spark.engine.engine import PromQLEngine

__all__ = ["PromQLEngine"]
