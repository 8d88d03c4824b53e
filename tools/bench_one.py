#!/usr/bin/env python
"""Isolated single-query bench: fresh session, same protocol as bench.py
(1 discarded cold + median of N warm, noop sink). For adjudicating a
query's bench number outside the full-protocol session.

Always measures the machine-drift canaries alongside the query (VERDICT
r12 #2: this box drifts up to ~3x intra-day, so an isolated raw number
is meaningless without its concurrent canary) and emits normalized
values against bench.py's pinned CANARY_BASELINE. Compare normalized
numbers across sessions; compare raw numbers only within one session.

Usage: python tools/bench_one.py <query> [sf_dir] [n_warm]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from bench import CANARY_BASELINE, canary_drift, measure_canaries  # noqa: E402
from vastdb_sdk_spark.operators.pinning import release_all_pins  # noqa: E402
from vastdb_sdk_spark.session import build_spark  # noqa: E402


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_warm = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = build_spark()
    fn = entry_mod.queries()[name]

    # canaries FIRST (they double as the JVM/footer warmup bench.py does)
    canary = measure_canaries(spark, sf_dir, 3)
    drift = canary_drift(canary)

    t0 = time.time()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    cold = time.time() - t0
    runs = []
    for _ in range(n_warm):
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        runs.append(time.time() - t0)
    # bench.py clears ONCE per query, after all warm runs — match it, or
    # persist-dependent gates measure a different thing here than there
    spark.catalog.clearCache()
    release_all_pins(spark)
    runs.sort()
    warm_median = statistics.median(runs)
    print(json.dumps({
        "query": name, "sf_dir": sf_dir, "cold": round(cold, 3),
        "warm_median": round(warm_median, 3),
        "warm_min_max": [round(runs[0], 3), round(runs[-1], 3)],
        "canary": canary,
        "canary_baseline": CANARY_BASELINE,
        "canary_drift": drift,
        "cold_normalized": round(cold / drift, 3),
        "warm_median_normalized": round(warm_median / drift, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
