from . import asof, dedup, multimodal, similarity  # noqa: F401
