from . import events, join  # noqa: F401
