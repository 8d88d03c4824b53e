#!/usr/bin/env python
"""4-arm interleaved A/B for dd_lsh_pairs: pin/no-pin x fan/no-fan
(VERDICT r14 'Next round' #1). One session, arms run round-robin so
machine drift hits all arms equally; canaries quoted for the record.

Arms toggle the module-level `_pin` / `_fan_out` helpers inside
vastdb_sdk_spark.operators.dedup — identity functions for the 'no'
variants — so the measured code is exactly the shipped path.

Usage: python tools/ab_lsh_arms.py [query] [sf_dir] [rounds]
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
from vastdb_sdk_spark.operators import dedup as dedup_mod  # noqa: E402
from vastdb_sdk_spark.operators.pinning import release_all_pins  # noqa: E402
from vastdb_sdk_spark.session import build_spark  # noqa: E402

REAL_PIN = dedup_mod._pin
REAL_FAN = dedup_mod._fan_out


def main() -> int:
    name = sys.argv[1] if len(sys.argv) > 1 else "dd_lsh_pairs"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = build_spark()
    fn = entry_mod.queries()[name]

    canary = measure_canaries(spark, sf_dir, 3)
    drift = canary_drift(canary)

    arms = {
        "pin+fan": (REAL_PIN, REAL_FAN),
        "pin+nofan": (REAL_PIN, lambda df, *a, **k: df),
        "nopin+fan": (lambda df: df, REAL_FAN),
        "nopin+nofan": (lambda df: df, lambda df, *a, **k: df),
    }
    times: dict[str, list[float]] = {k: [] for k in arms}
    # one discarded cold per arm first (JVM/codegen warmup), then
    # interleaved timed rounds
    for warmup in (True, False):
        n = 1 if warmup else rounds
        for _ in range(n):
            for arm, (p, f) in arms.items():
                dedup_mod._pin = p
                dedup_mod._fan_out = f
                try:
                    t0 = time.time()
                    fn(spark, sf_dir).write.mode("overwrite").format(
                        "noop"
                    ).save()
                    dt = time.time() - t0
                finally:
                    dedup_mod._pin = REAL_PIN
                    dedup_mod._fan_out = REAL_FAN
                spark.catalog.clearCache()
                release_all_pins(spark)
                if not warmup:
                    times[arm].append(round(dt, 3))

    out = {
        "query": name,
        "sf_dir": sf_dir,
        "rounds": rounds,
        "canary": canary,
        "canary_baseline": CANARY_BASELINE,
        "canary_drift": drift,
        "arms": {
            arm: {
                "runs": ts,
                "median": round(statistics.median(ts), 3),
                "median_normalized": round(
                    statistics.median(ts) / drift, 3
                ),
            }
            for arm, ts in times.items()
        },
    }
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
