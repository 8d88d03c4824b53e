from . import inspect, pruning  # noqa: F401
