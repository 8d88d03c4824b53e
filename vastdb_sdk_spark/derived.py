"""DerivedTable: the reference-style select() surface over any DataFrame.

The reference exposes its catalog and audit log as *tables* queried through
the ordinary select API (vastdb/transaction.py:107-121). Engine-derived
DataFrames (catalog, audit log, blob expansions) get the same treatment
here: projection + predicate DSL + limit + Arrow streaming, without being
backed by manifest files.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
from pyspark.sql import DataFrame

from .expr import to_spark_predicate


class DerivedTable:
    def __init__(self, df: DataFrame):
        self._df = df

    def df(self) -> DataFrame:
        return self._df

    def select_df(
        self,
        columns: list[str] | None = None,
        predicate: Any = None,
        *,
        limit_rows: int | None = None,
    ) -> DataFrame:
        df = self._df
        pred = to_spark_predicate(predicate)
        if pred is not None:
            df = df.filter(pred)
        if columns is not None:
            df = df.select(*columns)
        if limit_rows is not None:
            df = df.limit(limit_rows)
        return df

    def select(
        self,
        columns: list[str] | None = None,
        predicate: Any = None,
        *,
        limit_rows: int | None = None,
    ) -> pa.RecordBatchReader:
        tbl = self.select_df(columns, predicate, limit_rows=limit_rows).toArrow()
        return pa.RecordBatchReader.from_batches(tbl.schema, iter(tbl.to_batches()))

    def count_rows(self, predicate: Any = None) -> int:
        return self.select_df(predicate=predicate).count()
