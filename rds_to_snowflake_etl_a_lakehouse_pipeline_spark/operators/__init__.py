"""Relational / dataflow operators: windows, joins, aggregates,
dedup (exact + fuzzy), similarity search, multimodal plumbing."""

from .joins import star_join  # noqa: F401
from .windows import (  # noqa: F401
    dedupe_latest,
    merge_upsert,
    scd2_close,
    surrogate_key,
    surrogate_key_two_phase,
)
