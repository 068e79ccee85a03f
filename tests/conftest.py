import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[16]")
        .appName("prometheus_spark_tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        # 1m Tungsten pages — tiny dim broadcasts otherwise pin a full
        # 16m page each (see prometheus_spark/session.py RECOMMENDED)
        .config("spark.buffer.pageSize", "1m")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
