from . import dedup, events, ingest, join, stateful  # noqa: F401
