"""Ship the package to Spark Python workers.

Driver-side ``sys.path`` tweaks don't reach executor Python workers; any
``mapInPandas``/UDF closure that references this package needs the source
on the workers' import path.  ``ensure_shipped`` zips the package once per
session and registers it with ``SparkContext.addPyFile`` — works in local
mode and on a real cluster alike.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED: set[int] = set()


def ensure_shipped(spark) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"prometheus_spark_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for f in files:
                    if not f.endswith(".py"):
                        continue
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "prometheus_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    sc.addPyFile(zpath)
    _SHIPPED.add(key)
