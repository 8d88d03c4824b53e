#!/usr/bin/env python
"""Interleaved fan/nofan A/B for any query whose operator module exposes a
module-level ``_fan_out`` (augment, sampling, contamination, dedup,
multimodal, similarity). One session, arms alternate so machine drift hits
both equally; canaries quoted for the record (VERDICT r14 #2: adjudicate
fan_out per site, keep only measured wins).

Usage: python tools/ab_fan_arms.py <module> <query> [sf_dir] [rounds]
e.g.   python tools/ab_fan_arms.py augment tx_prefix_lm
"""

from __future__ import annotations

import importlib
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
    mod = importlib.import_module(
        f"vastdb_sdk_spark.operators.{sys.argv[1]}"
    )
    name = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    real_fan = mod._fan_out
    spark = build_spark()
    fn = entry_mod.queries()[name]

    canary = measure_canaries(spark, sf_dir, 3)
    drift = canary_drift(canary)

    arms = {"fan": real_fan, "nofan": (lambda df, *a, **k: df)}
    times: dict[str, list[float]] = {k: [] for k in arms}
    for warmup in (True, False):
        n = 1 if warmup else rounds
        for _ in range(n):
            for arm, f in arms.items():
                mod._fan_out = f
                try:
                    t0 = time.time()
                    fn(spark, sf_dir).write.mode("overwrite").format(
                        "noop"
                    ).save()
                    dt = time.time() - t0
                finally:
                    mod._fan_out = real_fan
                spark.catalog.clearCache()
                release_all_pins(spark)
                if not warmup:
                    times[arm].append(round(dt, 3))

    out = {
        "query": name,
        "module": sys.argv[1],
        "sf_dir": sf_dir,
        "rounds": rounds,
        "canary": canary,
        "canary_baseline": CANARY_BASELINE,
        "canary_drift": drift,
        "arms": {
            arm: {
                "runs": ts,
                "median": round(statistics.median(ts), 3),
                "median_normalized": round(statistics.median(ts) / drift, 3),
            }
            for arm, ts in times.items()
        },
    }
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
