"""Engine/query configuration.

Mirrors the reference's QueryConfig / ImportConfig knobs (vastdb/config.py)
where they still mean something on Spark, and adds Spark-side knobs. The
reference's wire-protocol knobs (5 MB request limit, subsplit paging) have no
Spark analog and are dropped per SURVEY.md §4.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class QueryConfig:
    """Scan tuning (reference: vastdb/config.py:26-50)."""

    num_splits: int | None = None  # reference: rows // rows_per_split; Spark: input partitions
    num_sub_splits: int = 4  # kept for API parity; Spark tasks subsume it
    limit_rows_per_sub_split: int = 128 * 1024  # arrow batch size on the way out
    rows_per_split: int = 4_000_000
    use_semi_sorted_projections: bool = True  # scan-routing rule (SURVEY.md §4)
    # select() results larger than this spill to parquet and stream back
    # through a pyarrow dataset reader (bounded memory, like the reference's
    # bounded-queue batch streaming — vastdb/table.py:597-704)
    spill_threshold_rows: int = 4_000_000
    semi_sorted_projection_name: str = ""  # force a specific projection
    queue_priority: int | None = None  # no-op on Spark; accepted for parity
    # reference wire-protocol knobs with no Spark analog; accepted so
    # SDK-style configs pass through unchanged (vastdb/config.py:32-41)
    data_endpoints: list | None = None
    num_row_groups_per_sub_split: int = 8


@dataclass
class ImportConfig:
    """Parquet import tuning (reference: vastdb/config.py:53-57)."""

    import_concurrency: int = 2


@dataclass
class EngineConfig:
    """Spark-side engine settings."""

    shuffle_partitions: int = 32
    max_partition_bytes: str = "128m"
    parquet_row_group_rows: int = 1 << 20
    arrow_batch_rows: int = 128 * 1024
    extra_spark_conf: dict = field(default_factory=dict)
