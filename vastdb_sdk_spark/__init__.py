"""vastdb_sdk_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of vast-data/vastdb_sdk.

Public API mirrors the reference (vastdb/__init__.py):

    import vastdb_sdk_spark as vastdb
    session = vastdb.connect(warehouse="/path/to/warehouse")
    with session.transaction() as tx:
        table = tx.bucket("b").schema("s").table("t")
        reader = table.select(columns=["a"], predicate=table_expr)

plus a Spark-first tier the reference delegates to DuckDB/ADBC: every table
is also a Spark DataFrame (``table.df()``/``table.select_df()``), and the
``operators``/``functions`` packages add joins/aggregation/windows, dedup,
similarity search, text analysis and streaming at scale.
"""

from . import functions, operators, plans, sources, streaming, util  # noqa: F401
from .config import EngineConfig, ImportConfig, QueryConfig
from .errors import (
    Conflict,
    InvalidArgument,
    MissingBucket,
    MissingProjection,
    MissingSchema,
    MissingSnapshot,
    MissingTable,
    NoAdbcConnection,
    NotSupportedCommand,
    NotSupportedSchema,
    ProjectionExists,
    SchemaExists,
    TableExists,
    TooLargeRequest,
    TooWideRow,
    TransactionClosed,
    VastdbSparkError,
)
from .expr import _, ColumnRef, Expr
from .metadata import BlobExpansion, TableMetadata, TableRef, VectorIndex
from .session import Session, build_spark, connect
from .table import INTERNAL_ROW_ID, Table, TableStats

__version__ = "0.1.0"

__all__ = [
    "connect",
    "build_spark",
    "Session",
    "Table",
    "TableStats",
    "INTERNAL_ROW_ID",
    "QueryConfig",
    "ImportConfig",
    "EngineConfig",
    "Expr",
    "ColumnRef",
    "_",
    "VastdbSparkError",
    "Conflict",
    "InvalidArgument",
    "MissingBucket",
    "MissingProjection",
    "MissingSchema",
    "MissingSnapshot",
    "MissingTable",
    "NotSupportedCommand",
    "NotSupportedSchema",
    "ProjectionExists",
    "SchemaExists",
    "TableExists",
    "TooLargeRequest",
    "TooWideRow",
    "TransactionClosed",
    "NoAdbcConnection",
    "TableRef",
    "TableMetadata",
    "VectorIndex",
    "BlobExpansion",
]
