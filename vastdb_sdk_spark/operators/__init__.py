from . import asof, dedup, multimodal, sampling, similarity, skew  # noqa: F401
