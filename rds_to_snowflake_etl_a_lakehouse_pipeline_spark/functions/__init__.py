"""Scalar function surface: cleansing/repair rules, text analysis, vectors."""

from .cleansing import (  # noqa: F401
    backfill_unit_price,
    int_yyyymmdd_to_date,
    map_codes,
    null_if_future,
    recompute_amount,
    strip_chars,
    strip_prefix,
    trim_columns,
)
from .text import (  # noqa: F401
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
)
from .vectors import cosine_similarity, dot_product, l2_norm  # noqa: F401
