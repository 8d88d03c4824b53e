from . import dedup, events, ingest, join, matview, stateful  # noqa: F401
