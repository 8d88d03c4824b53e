#!/usr/bin/env python
"""Measure sync_minhash_signatures' churn-span claim (SCALING.md): with a
FIXED churn (500 text rewrites + 100 deletes + 100 inserts), the
incremental signature sync must stay ~flat as the corpus grows — it
re-derives signatures for churned keys only and MERGE-deletes their old
band rows — while a full rebuild grows with the corpus.

Protocol per size (5k / 25k / 125k docs, documents.parquet replicated with
id offsets): build the corpus table (multi-file), full-build the signature
table once (that is the FULL measurement), then 3 cycles of
(churn txn, incremental sync) — each sync folds exactly its own churn, so
cycles are comparable; report the median.

Usage: python tools/sig_sync_churn_bench.py [--runs 3] [--out FILE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_size(spark, mult: int, runs: int) -> dict:
    import pyarrow as pa
    from pyspark.sql import functions as F

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark import _ as D
    from vastdb_sdk_spark.sources.replicate import sync_minhash_signatures

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_base = base.count()
    corpus = base
    for i in range(1, mult):
        corpus = corpus.unionByName(
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                # vary the text so replicas aren't byte-identical docs
                F.concat(F.col("text"), F.lit(f" replica {i}")).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    session = vastdb.connect(tempfile.mkdtemp(prefix="sigchurn_"), spark=spark)
    session.create_bucket("b")
    with session.transaction() as tx:
        sc = tx.bucket("b").create_schema("s")
        t = sc.create_table(
            "docs",
            sorting_key=["doc_id"],
            columns=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("text", pa.string()),
                    ("lang", pa.string()),
                    ("source", pa.string()),
                    ("n_chars", pa.int64()),
                ]
            ),
        )
        t.insert_df(corpus.select("doc_id", "text", "lang", "source", "n_chars"))
        sc.create_table(
            "sig",
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("band_id", pa.int32()),
                    ("band_key", pa.int64()),
                ]
            ),
        )
    with session.transaction() as tx:
        t = tx.bucket("b").schema("s").table("docs")
        t.optimize(target_file_rows=10_000)

    def _tables(tx):
        s = tx.bucket("b").schema("s")
        return s.table("docs"), s.table("sig")

    t0 = time.monotonic()
    with session.transaction() as tx:
        docs, sig = _tables(tx)
        r = sync_minhash_signatures(docs, sig)
        assert r["mode"] == "full"
    full_s = time.monotonic() - t0

    incr = []
    for cycle in range(runs):
        lo = cycle * 700
        with session.transaction() as tx:
            docs, _ = _tables(tx)
            docs.update_where(
                D.doc_id.between(lo, lo + 499), {"text": f"rewritten {cycle}"}
            )
            docs.delete_where(D.doc_id.between(lo + 500, lo + 599))
            docs.insert(
                pa.table(
                    {
                        "doc_id": pa.array(
                            [90_000_000 + cycle * 1000 + j for j in range(100)],
                            pa.int64(),
                        ),
                        "text": pa.array(
                            [f"fresh doc {cycle} {j}" for j in range(100)]
                        ),
                        "lang": pa.array(["en"] * 100),
                        "source": pa.array(["srcX"] * 100),
                        "n_chars": pa.array([20] * 100, pa.int64()),
                    }
                )
            )
        t0 = time.monotonic()
        with session.transaction() as tx:
            docs, sig = _tables(tx)
            r = sync_minhash_signatures(docs, sig, mode="incremental")
            assert r["mode"] == "incremental", r
        incr.append(time.monotonic() - t0)
    return {
        "docs": n_base * mult,
        "full_build_s": round(full_s, 3),
        "incremental_s": [round(x, 3) for x in incr],
        "incremental_median_s": round(statistics.median(incr), 3),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default="SIG_SYNC_CHURN.json")
    args = ap.parse_args()
    from vastdb_sdk_spark.session import build_spark

    spark = build_spark(app_name="sig_sync_churn_bench")
    sizes = []
    for mult in (1, 10, 100):
        sizes.append(run_size(spark, mult, args.runs))
        print(json.dumps(sizes[-1]))
    out = {
        "fixed_churn": "500 updates + 100 deletes + 100 inserts per cycle",
        "sizes": sizes,
        "incr_growth_at_100x": round(
            sizes[-1]["incremental_median_s"]
            / max(sizes[0]["incremental_median_s"], 1e-9),
            2,
        ),
        "full_growth_at_100x": round(
            sizes[-1]["full_build_s"] / max(sizes[0]["full_build_s"], 1e-9), 2
        ),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
