"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB, compare row count, schema
(column names), and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [name_filter] [--json out.json]
(--json additionally writes the driver's CORRECTNESS_r*.json shape)
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
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.001"
    name_filter = argv[1] if len(argv) > 1 else ""

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_CPUS", "8"),
        )
        # single-file parquet from duckdb at sf1/sf10 splits into only a
        # handful of 128MB scan partitions, serializing regex/UDF-heavy
        # map stages on a 32-core box — split finer
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # sf1-sized streaming memory-sink collects overflow the 1g
        # default and surface as TaskResultLost (driver block manager
        # evicting task results) — not a product failure
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "16g"))
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.buffer.pageSize", "1m")
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
    report: dict = {}
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
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:200]}", flush=True)
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "err": f"{type(e).__name__}: {str(e)[:300]}"}
            bad += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows", flush=True)
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": len(srows),
                            "err": None, "note": "no oracle"}
            rows_only += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}", flush=True)
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "err": f"duckdb: {str(e)[:300]}"}
            bad += 1
            continue
        dcols = sorted(ddf.columns)
        if scols != dcols:
            print(f"FAIL {name}: schema mismatch spark={scols} duckdb={dcols}")
            report[name] = {"rows_match": None, "schema_match": False,
                            "hash_match": False, "err": None}
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
            report[name] = {"rows_match": False, "schema_match": True,
                            "hash_match": False, "spark_rows": len(sset),
                            "oracle_rows": len(dset), "err": None}
            bad += 1
            continue
        if sset != dset:
            diffs = [(a, b) for a, b in zip(sset, dset) if a != b]
            print(f"FAIL {name}: {len(diffs)} value diffs; first: {diffs[:2]}")
            report[name] = {"rows_match": True, "schema_match": True,
                            "hash_match": False, "spark_rows": len(sset),
                            "oracle_rows": len(dset), "err": None}
            bad += 1
            continue
        print(f"OK   {name}: {len(sset)} rows", flush=True)
        report[name] = {"rows_match": True, "schema_match": True,
                        "hash_match": True, "spark_rows": len(sset),
                        "oracle_rows": len(dset), "err": None}
        ok += 1
    print(f"\n{ok} ok, {bad} fail, {rows_only} rows-only")
    if json_out:
        import json as _json

        with open(json_out, "w") as f:
            _json.dump(report, f, indent=2)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
