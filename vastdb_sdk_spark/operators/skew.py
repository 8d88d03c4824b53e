"""Skew mitigation: salting helpers for hot-key aggregations and joins.

AQE's skew-join handling (spark.sql.adaptive.skewJoin) splits oversized
partitions at runtime and is on by default in this engine's sessions; these
helpers cover the cases AQE can't fix:

- **two-stage salted aggregation**: a groupBy on a key where one value owns
  a large fraction of rows puts that fraction through one task. Salting
  splits each key into N subkeys (partial agg), then re-aggregates the N
  partials — the classic map-side-combine-resistant skew fix. Correct for
  decomposable aggregates (sum/count/min/max).
- **salted broadcast-side join**: replicate the small side N ways so the
  skewed big side's salt spreads its hot key over N tasks.

Salt uses a deterministic hash of stable row attributes, NOT rand(), so
plans stay reproducible and retries deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, num_salts: int, salt_from: list[str] | None) -> Column:
    if salt_from:
        src = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in salt_from])
        return F.pmod(F.xxhash64(src), F.lit(num_salts))
    return F.pmod(F.monotonically_increasing_id(), F.lit(num_salts))


def salted_agg_sum(
    df: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    num_salts: int = 16,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """sum() per group in two shuffles of uniform size instead of one skewed
    one: (key, salt) partial sums, then key finals. The partial shuffle has
    num_salts entries per hot key, each ~1/num_salts of the hot rows."""
    salted = df.withColumn("__salt", _salt_col(df, num_salts, salt_from))
    partial = salted.groupBy(*group_cols, "__salt").agg(
        *[F.sum(c).alias(f"__p_{c}") for c in sum_cols],
        F.count(F.lit(1)).alias("__p_cnt"),
    )
    return partial.groupBy(*group_cols).agg(
        *[F.sum(f"__p_{c}").alias(f"sum_{c}") for c in sum_cols],
        F.sum("__p_cnt").alias("n_rows"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 16,
    salt_from: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has hot keys and ``small`` is broadcastable:
    salt the big side, explode the small side across all salts, join on
    (key, salt). The hot key's rows land in num_salts tasks instead of 1."""
    bigs = big.withColumn("__salt", _salt_col(big, num_salts, salt_from))
    smalls = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    out = bigs.join(F.broadcast(smalls), [on, "__salt"], how)
    return out.drop("__salt")
