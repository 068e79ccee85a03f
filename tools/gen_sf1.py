"""Synthesize an sf1 (10× sf0.1) bench dataset by replication.

Usage: python tools/gen_sf1.py [out_dir] [--skew]
(default /tmp/spark_graft_sf1; --skew writes the skewed variant)

Scaling rules (×10, one replica per i in 0..9):
- events: user_id += i·1e7 (series CARDINALITY ×10 over the same time
  range — the realistic scale axis for PromQL: more series, not a longer
  retention window), event_id += i·1e10
- documents: doc_id += i·1e7; a replica marker is prepended to the text
  (keeps per-replica near-dup structure; cross-replica texts stay
  near-identical, so candidate-pair output grows super-linearly — noted
  in the bench output, it is a deliberately adversarial dedup load)
- embeddings: vec_id += i·1e7 (duplicate vectors → heavy-tie top-k)
- lineitem/orders: order keys += i·1e9 (custkeys untouched so dimension
  joins stay valid)
- dimension tables copied unchanged

``--skew`` additionally concentrates load on single hot keys — the
shape that breaks naive hash-partitioned plans and that AQE skew-join
splitting plus the dedup operators' df-caps must absorb:
- events: replicas 0-1 collapse onto user_id=42 (≈20% of all rows on
  one groupBy/sessionization key)
- documents: replicas 0-1 get a shared trailing sentence (one hot
  bigram/shingle in ≈20% of docs — the inverted-index hot-gram case)

Then run:  SPARK_GRAFT_SF_DIR=<out_dir> python bench.py
(tools/bench_sf1.py does both.)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = 10


def generate(
    out_dir: str, src: str = SRC, replicas: int = REPLICAS, skew: bool = False
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def copy(sql: str, name: str) -> None:
        dst = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(dst):
            return
        con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")

    def tbl(name: str) -> str:
        return f"read_parquet('{src}/{name}.parquet')"

    r = f"(SELECT unnest(range({replicas})) AS i)"
    user_expr = (
        "CASE WHEN i < 2 THEN 42 ELSE user_id + i * 10000000 END"
        if skew
        else "user_id + i * 10000000"
    )
    text_expr = (
        "'replica ' || i || ' ' || text || "
        "CASE WHEN i < 2 THEN ' the hot gram rides again' ELSE '' END"
        if skew
        else "'replica ' || i || ' ' || text"
    )
    copy(
        f"""SELECT event_id + i * 10000000000 AS event_id, ts,
                   {user_expr} AS user_id,
                   event_type, value, props
            FROM {tbl('events')} CROSS JOIN {r}""",
        "events",
    )
    copy(
        f"""SELECT doc_id + i * 10000000 AS doc_id,
                   {text_expr} AS text,
                   lang, source, n_chars
            FROM {tbl('documents')} CROSS JOIN {r}""",
        "documents",
    )
    copy(
        f"""SELECT vec_id + i * 10000000 AS vec_id, embedding, label
            FROM {tbl('embeddings')} CROSS JOIN {r}""",
        "embeddings",
    )
    copy(
        f"""SELECT l_orderkey + i * 1000000000 AS l_orderkey,
                   l_partkey, l_suppkey, l_linenumber, l_quantity,
                   l_extendedprice, l_discount, l_tax, l_returnflag,
                   l_linestatus, l_shipdate
            FROM {tbl('lineitem')} CROSS JOIN {r}""",
        "lineitem",
    )
    copy(
        f"""SELECT o_orderkey + i * 1000000000 AS o_orderkey, o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {tbl('orders')} CROSS JOIN {r}""",
        "orders",
    )
    for name in ("region", "nation", "customer", "supplier", "part"):
        copy(f"SELECT * FROM {tbl(name)}", name)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--skew"]
    skew = "--skew" in sys.argv[1:]
    out = args[0] if args else (
        "/tmp/spark_graft_sf1_skew" if skew else "/tmp/spark_graft_sf1"
    )
    generate(out, skew=skew)
    print(out)
