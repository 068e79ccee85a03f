"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB, compare row count, schema
(column names), and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    ok = bad = rows_only = 0
    for name, fn in qs.items():
        if name_filter and not any(
            f and f in name for f in name_filter.split(",")
        ):
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            bad += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows")
            rows_only += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            bad += 1
            continue
        dcols = sorted(ddf.columns)
        if scols != dcols:
            print(f"FAIL {name}: schema mismatch spark={scols} duckdb={dcols}")
            bad += 1
            continue
        sset = sorted(tuple(norm(r[c]) for c in scols) for r in srows)
        dset = sorted(
            tuple(norm(v) for v in row)
            for row in ddf[dcols].itertuples(index=False, name=None)
        )
        if len(sset) != len(dset):
            print(f"FAIL {name}: rowcount spark={len(sset)} duckdb={len(dset)}")
            print("  spark sample:", sset[:3])
            print("  duck sample:", dset[:3])
            bad += 1
            continue
        if sset != dset:
            diffs = [(a, b) for a, b in zip(sset, dset) if a != b]
            print(f"FAIL {name}: {len(diffs)} value diffs; first: {diffs[:2]}")
            bad += 1
            continue
        print(f"OK   {name}: {len(sset)} rows")
        ok += 1
    print(f"\n{ok} ok, {bad} fail, {rows_only} rows-only")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
