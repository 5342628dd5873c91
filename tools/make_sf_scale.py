"""Deterministically scale the driver testdata up by an integer factor.

The sandbox only ships sf0.001/0.01/0.1; the bench needs one rung above
toy scale so the dedup/ANN/FTS paths are measured where shuffles start
to matter (sf0.1's slowest query is ~2.5 s). This synthesizes
``sf0.1 × factor`` into an output dir by replicating the FACT tables
with perturbed keys — no RNG, so every run of the tool produces the
same bytes:

- ``documents``: doc_id offset per replica, text suffixed with a
  replica token (keeps replicas near-duplicates, not exact duplicates —
  the realistic shape for dedup queries);
- ``embeddings``: vec_id offset (vectors identical across replicas —
  ANN must still separate them by id);
- ``lineitem``/``orders``: orderkey offset, consistently on both sides
  so the order⋈lineitem join keeps its fan-out;
- ``events``: event_id/user_id offset (each replica is a fresh user
  population — session structure preserved, cardinality ×N);
- dimension tables (region/nation/customer/supplier/part) copied
  verbatim: dims don't scale with the corpus.

Usage: python tools/make_sf_scale.py [--src DIR] [--out DIR] [--factor N]
"""

from __future__ import annotations

import argparse
import os
import shutil

import duckdb

OFF = 10_000_000  # key offset per replica; far above any sf0.1 key

SCALED_SQL = {
    "documents": """
        SELECT doc_id + r * {off} AS doc_id,
               text || ' r' || CAST(r AS VARCHAR) AS text,
               lang, source, n_chars
        FROM read_parquet('{src}/documents.parquet') CROSS JOIN range({n}) t(r)
    """,
    "embeddings": """
        SELECT vec_id + r * {off} AS vec_id, embedding, label
        FROM read_parquet('{src}/embeddings.parquet') CROSS JOIN range({n}) t(r)
    """,
    "lineitem": """
        SELECT l_orderkey + r * {off} AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{src}/lineitem.parquet') CROSS JOIN range({n}) t(r)
    """,
    "orders": """
        SELECT o_orderkey + r * {off} AS o_orderkey, o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{src}/orders.parquet') CROSS JOIN range({n}) t(r)
    """,
    "events": """
        SELECT event_id + r * {off} AS event_id, ts,
               user_id + r * {off} AS user_id, event_type, value, props
        FROM read_parquet('{src}/events.parquet') CROSS JOIN range({n}) t(r)
    """,
}

COPIED = ["region", "nation", "customer", "supplier", "part"]


def make(src: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, sql in SCALED_SQL.items():
        q = sql.format(src=src, n=factor, off=OFF)
        con.execute(
            f"COPY ({q}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
    for table in COPIED:
        shutil.copyfile(f"{src}/{table}.parquet", f"{out}/{table}.parquet")
    with open(os.path.join(out, "_SCALED"), "w") as f:
        f.write(f"src={src} factor={factor}\n")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/kgap_sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    make(args.src, args.out, args.factor)
    print(f"wrote {args.out} (factor {args.factor})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
