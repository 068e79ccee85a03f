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
import threading
import zipfile

_SHIPPED: set[int] = set()
_LOCK = threading.Lock()


def ensure_shipped(spark) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:  # fast path, no lock
        return
    with _LOCK:
        if key in _SHIPPED:
            return
        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        # fingerprint the source tree (paths + mtimes) into the zip name so
        # a stale zip from an earlier run/pid is never shipped
        import hashlib

        fp = hashlib.md5()
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    fp.update(full.encode())
                    fp.update(str(os.path.getmtime(full)).encode())
        zpath = os.path.join(
            tempfile.gettempdir(),
            f"prometheus_spark_pkg_{os.getpid()}_{fp.hexdigest()[:10]}.zip",
        )
        if not os.path.exists(zpath):
            # write-to-temp + atomic rename: a concurrent reader (or an
            # executor fetching the registered file) can never observe a
            # partially-written zip
            fd, tmp = tempfile.mkstemp(suffix=".zip", dir=tempfile.gettempdir())
            os.close(fd)
            with zipfile.ZipFile(tmp, "w") as zf:
                for root, _dirs, files in os.walk(pkg_dir):
                    if "__pycache__" in root:
                        continue
                    for f in sorted(files):
                        if not f.endswith(".py"):
                            continue
                        full = os.path.join(root, f)
                        rel = os.path.join(
                            "prometheus_spark", os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, rel)
            os.replace(tmp, zpath)
        sc.addPyFile(zpath)
        _SHIPPED.add(key)
