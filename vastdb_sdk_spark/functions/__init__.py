from . import vector, text  # noqa: F401
