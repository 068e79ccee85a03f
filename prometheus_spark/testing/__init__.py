from prometheus_spark.testing.promqltest import run_test_text, TestStats

__all__ = ["run_test_text", "TestStats"]
