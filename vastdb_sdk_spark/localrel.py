"""Pure-Catalyst local relations for small literal row sets.

``spark.createDataFrame(rows)`` in classic PySpark builds a ``LogicalRDD``
(Scan ExistingRDD): every action that reads the frame re-runs a
Python-worker RDD scan job, a fixed ~0.3 s on this harness (measured r14:
a 150k-row parquet scan noop's in 0.08 s; the same scan unioned with a
ONE-ROW createDataFrame frame takes 0.35 s). Sub-second queries that union
a sentinel row, join a handful of planted rows, or broadcast a small
literal table pay that tax on every run.

:func:`local_df` ships the same rows as Catalyst LITERALS instead —
``Range(1) -> explode(array(struct(...)))`` — so the data lives in the
plan, executes JVM-side in the consuming stage, and adds zero jobs.
Intended for SMALL row sets (every value becomes a literal expression in
the plan); bulk data belongs in parquet-backed frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _parse_schema(schema) -> T.StructType:
    if isinstance(schema, T.StructType):
        return schema
    parsed = T._parse_datatype_string(schema)
    if not isinstance(parsed, T.StructType):
        raise ValueError(f"local_df schema must be a struct, got {parsed}")
    return parsed


def local_df(spark, rows, schema) -> DataFrame:
    """A small literal DataFrame as a pure Catalyst plan (no RDD).

    ``rows``: iterable of tuples/lists (one per row, matching ``schema``
    field order). ``schema``: DDL string (``"a LONG, b STRING"``) or
    StructType. ``None`` values become typed NULLs. Empty ``rows``
    produces an empty LocalRelation."""
    st = _parse_schema(schema)
    rows = list(rows)
    if not rows:
        # empty createDataFrame is a true LocalRelation (no RDD) already
        return spark.createDataFrame([], st)
    structs = []
    for r in rows:
        if len(r) != len(st.fields):
            raise ValueError(
                f"local_df row has {len(r)} values for {len(st.fields)} fields"
            )
        structs.append(
            F.struct(
                *[
                    F.lit(v).cast(f.dataType).alias(f.name)
                    for f, v in zip(st.fields, r)
                ]
            )
        )
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("__r"))
        .select(*[F.col("__r").getField(f.name).alias(f.name) for f in st.fields])
    )
