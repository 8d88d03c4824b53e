"""Physical-plan inspection helpers.

Used by tests (and by developers iterating on operators) to assert the plan
properties the 100 TB design depends on: filters reached the parquet scan,
projection was pruned, small sides were broadcast, no accidental extra
shuffles. This is the `.explain("formatted")`-and-iterate loop, mechanized.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters bodies, one string per parquet scan (filters may nest
    commas, so they are not split further)."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.append(body)
    return out


def read_schemas(df: DataFrame) -> list[str]:
    return re.findall(r"ReadSchema: (struct<[^\n]*)", formatted_plan(df))


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchanges (excludes BroadcastExchange)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"\(\d+\) BroadcastHashJoin\b", formatted_plan(df)))


def sortmerge_join_count(df: DataFrame) -> int:
    return len(re.findall(r"\(\d+\) SortMergeJoin\b", formatted_plan(df)))


def scanned_file_count(df: DataFrame) -> int:
    """Number of files in the scan's InMemoryFileIndex (file-level pruning
    check). Falls back to the input-files API."""
    return len(df.inputFiles())


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    filters = pushed_filters(df)
    assert any(fragment in f for f in filters), (
        f"expected a pushed filter containing {fragment!r}; got {filters}"
    )


def assert_column_pruned(df: DataFrame, column: str) -> None:
    # match the NAME position (after '<' or ',') so 'c1' doesn't
    # false-positive against 'c12:float' in the schema string
    pat = re.compile(rf"[<,]{re.escape(column)}:")
    schemas = read_schemas(df)
    assert schemas and all(not pat.search(s) for s in schemas), (
        f"column {column!r} should not be read; ReadSchema = {schemas}"
    )
