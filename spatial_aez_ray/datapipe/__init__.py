"""Tabular training-data pipelines over the star-schema test tables:
relational primitives, dedup family, text analysis, similarity search,
multimodal plumbing."""

from . import dedup, multimodal, relational, simsearch, temporal, text  # noqa: F401
