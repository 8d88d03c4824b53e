#!/usr/bin/env python
"""Scale-decade measurement for SCALING.md: run the most expensive headline
queries at two scale directories (default driver sf0.1 vs the generated
.scale/sf1 replica — see tools/gen_scale_replica.py) and print a per-query
ratio table.

Isolation protocol: EVERY (dir, query) measurement runs in a FRESH
SparkSession subprocess — one discarded cold run, then median of N warm
runs. A first shared-session version of this harness showed up to 30x
phantom inflation on tail queries (o5_vector_topk_l2 measured 18.4 s
shared vs 0.6 s isolated at sf1): 28 queries x 4 runs in one JVM
accumulate codegen/GC/block-manager state that contaminates whatever runs
last. Session startup (~8 s) is excluded by timing inside the subprocess.

A 10x data step on local[32] should cost <= ~10x per query (linear);
well under that is overhead-dominated or pruned. Anything super-linear
(ratio > 10 with margin) is flagged for plan diagnosis.

Usage: python tools/scale_decade.py [--a /root/testdata/sf0.1]
           [--b /root/repo/.scale/sf1] [--runs 3] [--out SCALE_DECADE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The expensive / scale-sensitive subset: every query > ~0.3 s at sf0.1 in
# BENCH_r06 plus the known worst scaler (f1_json_expansion) and one
# representative per family (scan, star join, window, sessionize).
QUERIES = [
    "dd_embed_neardup",
    "dd_simhash",
    "dd_simhash_fast",
    "dd_lsh_pairs",
    "dd_lsh_pairs_fast",
    "dd_minhash_sig",
    "dd_dup_clusters",
    "dd_contamination",
    "dd_exact",
    "ann_ivf_knn_join",
    "ann_quantize_int8",
    "ann_cosine_topk",
    "o5_vector_topk_l2",
    "tx_repetition",
    "tx_bigram_topk",
    "ds_quality_filter",
    "j1_star_join_revenue",
    "tpch_q2",
    "tpch_q5",
    "tpch_q7",
    "tpch_q9",
    "tpch_q21",
    "f1_json_expansion",
    "sessionize_batch",
    "w1_topk_per_group",
    "asof_last_purchase",
    "range_join_purchases",
    "s1_scan_project",
    # round-7 additions
    "dd_passage_dups",
    "tx_unigram_logprob",
    "ann_pq_topk",
    "ann_knn_join_blocked",
    "tx_bpe_tokens",
    "ann_ivfpq_topk",
    "tx_bm25_topk",
    # round-8 additions
    "tx_hybrid_topk",
    "dd_phash_neardup",
    "dd_semantic_dedup",
    "ann_ivfpq_persisted",
    "tx_bpe_learned",
    "tx_clf_quality",
    # round-9 additions (e17 runs the linear auto-centroid default;
    # e18's refresh cost tracks churn, so its decade should be ~flat)
    "e17_semantic_dedup_inplace",
    "e18_refresh_incremental",
    "tx_bigram_logprob",
    # round-9 session-2 additions (e22/el6 warm runs measure the
    # maintained-view read / bloom-pruned lookup — index-bound, ~flat)
    "e22_matview_incremental",
    "tx_nb_train",
    "tx_nb_classify",
    "ts_gapfill",
    "ds_weighted_sample",
    "el6_bloom_point",
    "ds_dsir_weights",
    "e23_matview_rollup",
    "e24_matview_timebucket",
    "tx_sentences",
    "tx_chunk_sentences",
    "ts_anomaly",
    "ann_matryoshka_topk",
    "tx_url_canon",
    "tx_html_strip",
]

_RUNNER = r"""
import json, statistics, sys, time
sys.path.insert(0, {repo!r})
import __spark_entry__ as entry_mod
from vastdb_sdk_spark.session import build_spark

name, sf_dir, runs = {name!r}, {sf_dir!r}, {runs}
spark = build_spark(app_name="scale_decade_" + name)
fn = entry_mod.queries()[name]
spark.read.parquet(sf_dir + "/lineitem.parquet").count()  # warm FS/footers
fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # cold
times = []
for _ in range(runs):
    t0 = time.time()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    times.append(time.time() - t0)
print("RESULT " + json.dumps(round(statistics.median(times), 3)))
"""


def measure(name: str, sf_dir: str, runs: int) -> float:
    code = _RUNNER.format(repo=REPO, name=name, sf_dir=sf_dir, runs=runs)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"{name} @ {sf_dir} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", default="/root/testdata/sf0.1")
    ap.add_argument("--b", default="/root/repo/.scale/sf1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default="/root/repo/.scale/SCALE_DECADE.json")
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset override")
    args = ap.parse_args()
    queries = args.queries.split(",") if args.queries else QUERIES
    a: dict[str, float] = {}
    b: dict[str, float] = {}
    for name in queries:
        a[name] = measure(name, args.a, args.runs)
        b[name] = measure(name, args.b, args.runs)
        print(f"  {name}: {a[name]}s -> {b[name]}s "
              f"({round(b[name]/a[name], 2)}x)", file=sys.stderr)
    rows = []
    for name in queries:
        ratio = round(b[name] / a[name], 2) if a[name] > 0 else None
        rows.append({"query": name, "a_sec": a[name], "b_sec": b[name],
                     "ratio": ratio})
    rows.sort(key=lambda r: -(r["ratio"] or 0))
    result = {"a": args.a, "b": args.b, "runs": args.runs,
              "isolation": "fresh-session-per-query", "rows": rows}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    print("\n| query | sf0.1 s | sf1 s | ratio |", file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for r in rows:
        print(f"| {r['query']} | {r['a_sec']} | {r['b_sec']} | "
              f"{r['ratio']}x |", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
