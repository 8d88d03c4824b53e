from . import asof, contamination, dedup, lm, multimodal, sampling, similarity, skew  # noqa: F401
