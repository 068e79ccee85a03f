from prometheus_spark.web.api import (  # noqa: F401
    PromAPI,
    marshal_float,
    render_histogram,
    render_result,
)
