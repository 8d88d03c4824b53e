from . import asof, dedup, multimodal, similarity, skew  # noqa: F401
