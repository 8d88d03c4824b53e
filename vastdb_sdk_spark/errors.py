"""Error hierarchy mirroring the reference SDK's user-visible exceptions.

Reference: vastdb/errors.py defines HttpError subclasses (Missing*, *Exists,
Conflict, TooWideRow, NotSupportedSchema, ...). We keep the same *names and
trigger conditions* but raise them from catalog/manifest logic instead of
HTTP responses.
"""

from __future__ import annotations


class VastdbSparkError(Exception):
    """Base class for all engine errors."""


class NotFoundError(VastdbSparkError):
    """Generic missing object."""


class MissingBucket(NotFoundError):
    pass


class MissingSchema(NotFoundError):
    pass


class MissingTable(NotFoundError):
    pass


class MissingProjection(NotFoundError):
    pass


class MissingMatView(NotFoundError):
    pass


class MissingView(NotFoundError):
    pass


class MissingSnapshot(NotFoundError):
    pass


class ExistsError(VastdbSparkError):
    """Generic already-exists conflict."""


class SchemaExists(ExistsError):
    pass


class TableExists(ExistsError):
    pass


class ProjectionExists(ExistsError):
    pass


class ViewExists(ExistsError):
    pass


class MatViewExists(ExistsError):
    pass


class Conflict(VastdbSparkError):
    """Concurrent-transaction commit conflict (reference: errors.Conflict,
    raised e.g. when two transactions mutate the same object —
    vastdb/tests/test_tables.py:869-882)."""


class NotSupportedSchema(VastdbSparkError):
    """Arrow schema contains a type the engine does not support
    (reference: vastdb/_ibis_support.py:8-28 validation gate)."""

    def __init__(self, message: str = "", schema=None, cause=None):
        super().__init__(message)
        self.schema = schema
        self.cause = cause


class NotSupportedCommand(VastdbSparkError):
    pass


class NotSupportedVersion(VastdbSparkError):
    pass


class TooWideRow(VastdbSparkError):
    """A single row exceeds the insert slice limit
    (reference: vastdb/util.py:103-104)."""


class TooLargeRequest(VastdbSparkError):
    """Serialized query request exceeds the wire limit
    (reference: vastdb/table.py:521-523)."""


class InvalidArgument(VastdbSparkError):
    pass


class TransactionClosed(VastdbSparkError):
    """Operation attempted on a committed/rolled-back transaction."""


class NoAdbcConnection(VastdbSparkError):
    """No ADBC driver available (reference: NoAdbcConnectionError —
    raised when a transaction's ADBC connection is requested but no
    driver was supplied; this engine's SQL tier is ``tx.sql``)."""
