#!/usr/bin/env python
"""Generate an sf-scaled replica of the driver's testdata for scale-decade
measurements (SCALING.md): M offset-keyed copies of a base sf directory,
written as one parquet per table.

Copy 0 is byte-identical to the base; copies 1..M-1 offset every key column
by copy*cardinality so joins stay consistent and key cardinalities grow
linearly (customer/supplier/part scale with the fact tables, like TPC-H).

Documents and embeddings need more than key offsets: a plain 10x copy would
make every document a 10-way exact duplicate, so the dedup operators'
candidate pairs would grow 45x by *construction* — measuring that says
nothing about how the operators scale on real data. Instead each copy k>0:

- documents: REPLACES ~40% of token positions (a fixed position set per
  copy) with copy-specific salt tokens 'c{k}p{i}'. Length-preserving on
  purpose: appending salt instead was measured to inflate doc length 1.8x
  and distinct-ngram cardinality superlinearly, which made every
  text-statistics query look super-linear for generator reasons, not
  engine reasons. Replacing 40% of positions kills most cross-copy
  3-token shingles (identical base docs land around Jaccard ~0.2 < the
  0.8 near-dup threshold), while within-copy pairs get the SAME
  positional replacements so their relation is preserved.
- embeddings: adds a per-copy unit noise vector at 0.7 magnitude and
  renormalizes. Cross-copy identical vectors land at cosine ~0.85 (measured) < the
  0.95 near-dup threshold; within-copy near pairs shift together and stay
  near.

So per copy the planted dup/near-dup structure is preserved, and the corpus
is M copies of it — dup density per row constant, exactly how a real corpus
grows.

Usage: python tools/gen_scale_replica.py [--base /root/testdata/sf0.1]
           [--out /root/repo/.scale/sf1] [--copies 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

CARD = {  # base sf0.1 cardinalities (dense 0-based keys, verified)
    "orders": 150_000,
    "customer": 15_000,
    "part": 20_000,
    "supplier": 1_000,
    "documents": 5_000,
    "embeddings": 2_000,
    "events": 100_000,
    "users": 1_500,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.scale/sf1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--tables", default=None,
                    help="comma-separated subset (default: all tables) — "
                    "for single-operator scale points (e.g. a 100-copy "
                    "embeddings-only sf10 for the embedding-dedup decade)")
    args = ap.parse_args()
    base, out, m = args.base, args.out, args.copies
    only = set(args.tables.split(",")) if args.tables else None
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count() or 8}")

    def src(t: str) -> str:
        return f"read_parquet('{base}/{t}.parquet')"

    def write(t: str, sql: str) -> None:
        if only is not None and t not in only:
            return
        # bounded row groups: a single 50k-row group would hand Spark ONE
        # splittable unit for the whole table (single-task scans — measured
        # to serialize every documents/embeddings query); 10k-row groups
        # parallelize like the multi-file layout a real corpus has
        con.execute(
            f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET, "
            "COMPRESSION SNAPPY, ROW_GROUP_SIZE 10000)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")

    ks = f"range({m}) ks(k)"

    # small dims: verbatim (region/nation keys are referenced by the scaled
    # tables and stay 5/25 like TPC-H)
    for t in ("region", "nation"):
        write(t, f"SELECT * FROM {src(t)}")

    write("customer", f"""
        SELECT c_custkey + k*{CARD['customer']} AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM {src('customer')}, {ks}""")
    write("supplier", f"""
        SELECT s_suppkey + k*{CARD['supplier']} AS s_suppkey,
               s_name, s_nationkey, s_acctbal
        FROM {src('supplier')}, {ks}""")
    write("part", f"""
        SELECT p_partkey + k*{CARD['part']} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM {src('part')}, {ks}""")
    write("orders", f"""
        SELECT o_orderkey + k*{CARD['orders']} AS o_orderkey,
               o_custkey + k*{CARD['customer']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}, {ks}""")
    write("lineitem", f"""
        SELECT l_orderkey + k*{CARD['orders']} AS l_orderkey,
               l_partkey + k*{CARD['part']} AS l_partkey,
               l_suppkey + k*{CARD['supplier']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')}, {ks}""")
    write("events", f"""
        SELECT event_id + k*{CARD['events']} AS event_id,
               ts,
               user_id + k*{CARD['users']} AS user_id,
               event_type, value, props
        FROM {src('events')}, {ks}""")

    write("documents", f"""
        WITH s AS (
            SELECT *, CASE WHEN k = 0 THEN text ELSE
                array_to_string(
                    list_transform(
                        string_split(text, ' '),
                        (t, i) -> CASE
                            WHEN (i * 2654435761 % 10) < 4
                            THEN 'c' || k || 'p' || i
                            ELSE t END),
                    ' ')
            END AS new_text
            FROM {src('documents')}, {ks}
        )
        SELECT doc_id + k*{CARD['documents']} AS doc_id,
               new_text AS text, lang, source,
               length(new_text) AS n_chars
        FROM s""")

    write("embeddings", f"""
        WITH nz AS (
            SELECT k, list_transform(range(64), d ->
                       ((k*73 + d*37) * 2654435761 % 1000) / 1000.0 - 0.5
                   ) AS raw
            FROM {ks}
        ), nzu AS (
            SELECT k, list_transform(raw, x ->
                       x / sqrt(list_sum(list_transform(raw, y -> y*y)))
                   ) AS unit
            FROM nz
        ), mixed AS (
            SELECT e.vec_id, e.embedding, e.label, n.k,
                   CASE WHEN n.k = 0 THEN CAST(e.embedding AS DOUBLE[])
                   ELSE list_transform(range(64), d ->
                       CAST(e.embedding[d+1] AS DOUBLE)
                       + 0.7 * n.unit[d+1])
                   END AS v
            FROM {src('embeddings')} e, nzu n
        )
        SELECT vec_id + k*{CARD['embeddings']} AS vec_id,
               CAST(list_transform(v, x ->
                    x / sqrt(list_sum(list_transform(v, y -> y*y))))
                    AS FLOAT[]) AS embedding,
               label
        FROM mixed""")


if __name__ == "__main__":
    main()
